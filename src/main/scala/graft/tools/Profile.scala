package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: runs one named SparkEntry query against a
  * given sf dir, printing timing and the formatted physical plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (sys.env.get("PROFILE_EXPLAIN").contains("1")) df.explain("formatted")
    val useNoop = sys.env.get("PROFILE_NOOP").contains("1")
    for (i <- 1 to sys.env.getOrElse("PROFILE_RUNS", "2").toInt) {
      val t0 = System.nanoTime()
      val n = if (useNoop) { df.write.format("noop").mode("overwrite").save(); -1L }
        else df.count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
