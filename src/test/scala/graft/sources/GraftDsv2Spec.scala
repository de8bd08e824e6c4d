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

  test("ORDER BY score DESC LIMIT n fully pushes: no Sort, k tightens") {
    val wide = spark.read.format("graft")
      .option("dir", dir).option("query", "spark join").option("k", "50").load()
    val topn = wide.orderBy(col("score").desc).limit(5)
    val plan = topn.queryExecution.executedPlan.toString
    assert(plan.contains("k=5"), s"topN limit not folded into k:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      s"sort survived a full topN pushdown:\n$plan")
    val got = topn.select(col("doc_id").cast("long")).as[Long].collect().toSeq
    val want = rel.limit(5).select(col("doc_id").cast("long")).as[Long].collect().toSeq
    assert(got == want, "topN result diverges from the probe's own top-5")
  }

  test("a non-score sort is declined: Spark keeps its Sort") {
    val byDoc = rel.orderBy(col("doc_id")).limit(4)
    val plan = byDoc.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Sort"),
      s"non-score sort must stay Spark-side:\n$plan")
    assert(plan.contains("k=10"), s"declined topN must not touch k:\n$plan")
    assert(byDoc.count() == 4)
  }

  test("reported k-bounded stats: corpus join broadcasts the graft side") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("d_id"), col("source"))
    val joined = rel.select("doc_id", "score").join(docs, col("doc_id") === col("d_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"k-row graft side should broadcast with no hint:\n$plan")
    assert(joined.count() == 10)
  }

  test("reported ordering: a score-desc local sort is eliminated") {
    // (a GLOBAL orderBy keeps its exchange — the connector API has no
    // way to declare SinglePartition — but the reported ordering makes
    // any sort-within-partitions on score DESC redundant)
    val ordered = rel.sortWithinPartitions(col("score").desc)
    val plan = ordered.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"),
      s"scan reports score-desc order; local Sort should be eliminated:\n$plan")
    val scores = ordered.select("score").as[Double].collect().toSeq
    assert(scores == scores.sorted.reverse, "rows not emitted score-descending")
  }

  test("large k fans out to multiple rank-range partitions; small k stays single") {
    // VERDICT r13 "What's missing #2": a serving read of many hits
    // must not funnel through ONE task. Partitions split by
    // contiguous rank range above graft.dsv2.rows.per.partition
    // (default 4096); content and per-partition ordering unchanged.
    val prev = System.getProperty("graft.dsv2.rows.per.partition")
    System.setProperty("graft.dsv2.rows.per.partition", "4")
    try {
      val big = spark.read.format("graft")
        .option("dir", dir).option("query", "spark join").option("k", "10").load()
      assert(big.rdd.getNumPartitions > 1,
        s"expected multi-partition emit, got ${big.rdd.getNumPartitions}")
      // same rows as the single-partition emit, rank ranges intact
      val rows = big.select("doc_id", "score").collect().toSet
      System.setProperty("graft.dsv2.rows.per.partition", "4096")
      val single = spark.read.format("graft")
        .option("dir", dir).option("query", "spark join").option("k", "10").load()
      assert(single.rdd.getNumPartitions == 1)
      assert(single.select("doc_id", "score").collect().toSet == rows)
    } finally {
      if (prev == null) System.clearProperty("graft.dsv2.rows.per.partition")
      else System.setProperty("graft.dsv2.rows.per.partition", prev)
    }
  }

  test("multi-partition read: an explicit downstream orderBy still returns globally sorted rows") {
    // ADVICE r14 (low): with fully-pushed TopN the plan-time Sort is
    // removed and GLOBAL order rests on consumers reading rank-range
    // partitions in index order. Pin that an explicit orderBy over
    // the multi-partition read re-sorts correctly — the always-safe
    // recovery the GraftScan scaladoc points users at — including
    // after a repartition that scrambles partition order.
    val prev = System.getProperty("graft.dsv2.rows.per.partition")
    System.setProperty("graft.dsv2.rows.per.partition", "3")
    try {
      val big = spark.read.format("graft")
        .option("dir", dir).option("query", "spark join").option("k", "10").load()
      assert(big.rdd.getNumPartitions > 1)
      val resorted = big.repartition(5)
        .orderBy(col("score").desc, col("doc_id"))
        .select("score").as[Double].collect().toSeq
      assert(resorted == resorted.sorted.reverse,
        "downstream orderBy must restore global score order")
      assert(resorted.nonEmpty)
    } finally {
      if (prev == null) System.clearProperty("graft.dsv2.rows.per.partition")
      else System.setProperty("graft.dsv2.rows.per.partition", prev)
    }
  }

  test("write path: overwrite + append land in documents.parquet; reads rebuild") {
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_dsv2_write_spec").getAbsolutePath
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.where(col("doc_id") % 2 === 0).write.format("graft")
      .option("dir", out).mode("overwrite").save()
    val n0 = spark.read.parquet(s"$out/documents.parquet").count()
    assert(n0 == docs.where(col("doc_id") % 2 === 0).count())
    // append the odd half; corpus is whole again
    docs.where(col("doc_id") % 2 === 1).write.format("graft")
      .option("dir", out).mode("append").save()
    assert(spark.read.parquet(s"$out/documents.parquet").count() == docs.count())
    // a read over the written dir answers like the original corpus
    // (registry keys caches by content signature — no stale index)
    val a = spark.read.format("graft")
      .option("dir", out).option("query", "spark join").option("k", "10").load()
      .select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSet
    val b = rel.select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSet
    assert(a == b, "written-corpus read diverges from source-corpus read")
    // a read result round-trips: the synthetic score column is shed
    spark.read.format("graft")
      .option("dir", out).option("query", "spark join").option("k", "3").load()
      .write.format("graft").option("dir", out).mode("append").save()
    val cols = spark.read.parquet(s"$out/documents.parquet").columns.toSeq
    assert(!cols.contains("score"), "score must not leak into the corpus")
  }

  test("append with a live index is INCREMENTAL: lineage shared, scores exact") {
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_dsv2_incr_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.where(col("doc_id") % 2 === 0).write.format("graft")
      .option("dir", out).mode("overwrite").save()
    // force the index build for the half corpus, keep its identity
    val idx1 = graft.search.SearchQueries.indexFor(spark, out)
    idx1.search(graft.dsl.Parsed("text", "spark"), 3).collect()
    // INSERT the other half through the DSv2 write path
    docs.where(col("doc_id") % 2 === 1).write.format("graft")
      .option("dir", out).mode("append").save()
    // the cached index was MERGED in place, not evicted + rebuilt:
    // the post-insert index's lineage holds the pre-insert index BY
    // IDENTITY (addDocuments sets parents = (base, delta)), which a
    // full re-tokenize of the archive could never have
    val idx2 = graft.search.SearchQueries.indexFor(spark, out)
    assert(idx2 ne idx1, "registry still serving the pre-insert index")
    assert(idx2.lineageParents.headOption.exists(_ eq idx1),
      "post-INSERT index does not share the base index's lineage — " +
        "the append fell back to a full rebuild")
    // and it scores EXACTLY like the source corpus's fresh index
    val a = spark.read.format("graft")
      .option("dir", out).option("query", "spark join").option("k", "10").load()
      .select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSet
    val b = rel.select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSet
    assert(a == b, "incrementally-maintained index diverges from fresh build")
    // an EXTERNAL mutation still forces the safe full rebuild: write
    // parquet directly (not through the graft source) and append again
    docs.where(col("doc_id") === 0).withColumn("doc_id", lit(900001L))
      .write.mode("append").parquet(s"$out/documents.parquet")
    docs.where(col("doc_id") === 0).withColumn("doc_id", lit(900002L))
      .write.format("graft").option("dir", out).mode("append").save()
    val idx3 = graft.search.SearchQueries.indexFor(spark, out)
    assert(idx3.lineageParents.isEmpty,
      "append after an external mutation must rebuild, not merge")
  }

  test("k is guarded: a driver-memory k fails fast with a pointer") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("dir", dir)
        .option("query", "spark").option("k", "10000000").load().collect()
    }
    assert(e.getMessage.contains("graft.dsv2.max.k") &&
      e.getMessage.contains("distributed"),
      s"k guard message unhelpful: ${e.getMessage.take(200)}")
  }

  test("SQL DDL: CREATE TABLE USING graft reads; INSERT INTO writes") {
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_dsv2_ddl_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.sql("DROP TABLE IF EXISTS graft_ddl_sink")
    spark.sql("DROP TABLE IF EXISTS graft_ddl_hits")
    // a query-less graft table is a SINK: INSERT INTO appends docs
    spark.sql(s"CREATE TABLE graft_ddl_sink USING graft OPTIONS (dir '$out')")
    spark.sql(
      s"""INSERT INTO graft_ddl_sink
         |SELECT * FROM parquet.`$dir/documents.parquet` WHERE doc_id % 2 = 0
         |""".stripMargin)
    spark.sql(
      s"""INSERT INTO graft_ddl_sink
         |SELECT * FROM parquet.`$dir/documents.parquet` WHERE doc_id % 2 = 1
         |""".stripMargin)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(spark.read.parquet(s"$out/documents.parquet").count() == docs.count())
    // a queried graft table is the top-k RELATION over the sink's dir
    spark.sql(
      s"""CREATE TABLE graft_ddl_hits USING graft
         |OPTIONS (dir '$out', query 'spark join', k '10')""".stripMargin)
    val a = spark.sql(
        "SELECT CAST(doc_id AS LONG) AS doc_id, round(score, 4) AS score " +
          "FROM graft_ddl_hits")
      .as[(Long, Double)].collect().toSet
    val b = rel.select(col("doc_id").cast("long"), round(col("score"), 4))
      .as[(Long, Double)].collect().toSet
    assert(a == b, "DDL-table read diverges from the reader-API read")
    spark.sql("DROP TABLE graft_ddl_sink")
    spark.sql("DROP TABLE graft_ddl_hits")
  }

  test("missing options fail fast; unknown pushdowns stay residual") {
    val e = intercept[IllegalArgumentException] {
      // query-less table IS writable — the miss surfaces at scan build
      spark.read.format("graft").option("dir", dir).load().collect()
    }
    assert(e.getMessage.contains("query"))
    // a text-field predicate is NOT pushed — Spark must evaluate it
    val df = rel.where(col("text").contains("spark"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), "text predicate must stay residual")
    assert(df.count() > 0)
  }
}
