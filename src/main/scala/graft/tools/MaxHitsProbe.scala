package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.search.{SearchIndex, SearchQueries}

/** One-off probe for the maxHitsPerIndex knob: query_join_bool's
  * shape at sf0.1, exact vs capped. */
object MaxHitsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // bounded top-k aggregates (TopKAgg) over thousands of groups:
      // the 128-key default forces the sort-based object-agg fallback,
      // which serializes each group buffer per row (measured 155s /
      // 7.3GB spill on a 3.7M-row seed aggregate, SCALE.md r15)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = SearchQueries.indexFor(spark, dir)
    val tk = col(SearchIndex.tokensColName("text"))
    val req = array(element_at(tk, 1))
    val opt = array_except(array_distinct(slice(tk, 2, 2)), req)
    val left = idx.docs.where(size(tk) >= 4 && col("doc_id") % 10 === 0)
      .select(col("doc_id"), req.as("req"), opt.as("opt"),
        array_except(array(element_at(tk, 4)), concat(req, opt)).as("exc"))
    def run(label: String, mh: Int): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = idx.queryJoinBool(left, "doc_id", col("req"), col("opt"), col("exc"),
          "text", k = 3, maxHitsPerIndex = mh)
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("exact (default)", Int.MaxValue)
    run("maxHitsPerIndex=1", 1)
    run("maxHitsPerIndex=2", 2)
    spark.stop()
  }
}
