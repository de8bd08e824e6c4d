package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 front door: format("graft") must resolve by
  * short name, push WHERE clauses into the index probe (visible in
  * EXPLAIN), push LIMIT into k, prune columns, and land on exactly
  * the Scala DSL path's rows. */
class GraftDsv2Spec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rel = spark.read.format("graft")
    .option("dir", dir).option("query", "spark join").option("k", "10").load()

  test("filters are pushed into the probe and EXPLAIN shows them") {
    val df = rel.where(col("lang") === "en" && col("n_chars").between(100L, 400L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), s"scan node missing:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(lang,en)"),
      s"pushed filters not visible:\n$plan")
    // no post-scan Filter remains: the scan handled every predicate
    assert(!plan.contains("+- Filter") && !plan.contains("n- Filter"),
      s"residual filter left above the scan:\n$plan")
  }

  test("pushed filters are load-bearing: top-k OF the filtered set") {
    import graft.dsl._
    import graft.dsl.builders._
    val sql = rel.where(col("lang") === "en" && col("n_chars").between(100L, 400L))
      .select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSeq
    val api = graft.search.SearchQueries.indexFor(spark, dir).search(
        ("text" matchAny termSet("spark", "join")) &&
          ("lang" === "en") && ("n_chars" in range(100L, 400L)), 10)
      .select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSeq
    assert(sql == api)
    assert(sql.size == 10)
    // a post-probe filter over the unfiltered top-10 would be a
    // DIFFERENT (smaller) set — prove we're not doing that
    val unfiltered = rel.select(col("doc_id").cast("long")).as[Long].collect().toSet
    assert(sql.map(_._1).exists(id => !unfiltered.contains(id)),
      "result equals filter-after-top-k; pushdown is not load-bearing")
  }

  test("LIMIT pushes into k; column pruning holds") {
    val limited = rel.limit(3)
    assert(limited.count() == 3)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("k=3"), s"limit not pushed into k:\n$plan")
    // pruning: a two-column projection reads a two-column scan
    val pruned = rel.select("doc_id", "score")
    assert(pruned.schema.fieldNames.toSeq == Seq("doc_id", "score"))
    assert(pruned.collect().length == 10)
  }

  test("missing options fail fast; unknown pushdowns stay residual") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("dir", dir).load()
    }
    assert(e.getMessage.contains("query"))
    // a text-field predicate is NOT pushed — Spark must evaluate it
    val df = rel.where(col("text").contains("spark"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), "text predicate must stay residual")
    assert(df.count() > 0)
  }
}
