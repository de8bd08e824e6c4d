package graft

import org.apache.spark.sql.SparkSession

// temporary profiling harness — not part of the library; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs rows = " + docs.count() + " avg_len = " +
      docs.select(avg(length(col("text")))).head().getDouble(0))
    // warm
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save()
    time("winnowing run1") {
      pipeline.TextAnalysis.winnowing(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("winnowing run2") {
      pipeline.TextAnalysis.winnowing(spark, dir).write.format("noop").mode("overwrite").save()
    }
    // tokenization only
    graft.functions.SearchExpressions.register(spark)
    val toksOnly = docs.select(col("doc_id"),
      split(lower(col("text")), "[^a-z0-9]+").as("tokens"))
    time("tokenize only") {
      toksOnly.select(col("doc_id"), size(col("tokens")).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    // native expr, single projection of the struct (no field split)
    time("winnow struct only") {
      docs.select(col("doc_id"),
        call_function("winnow_fingerprint",
          array_remove(split(lower(col("text")), "[^a-z0-9]+"), ""), lit(5), lit(4)).as("wf"))
        .write.format("noop").mode("overwrite").save()
    }
    pipeline.TextAnalysis.winnowing(spark, dir).explain("formatted")
    spark.stop()
  }
}
