package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two escape hatches for dense expansion queries
  * (SCALE.md): the same wildcard/fuzzy AST join as the
  * `query_join_ast_expand` entry, run three ways —
  *
  *   - EXACT: full candidate verify, |left| x Theta(corpus) work on
  *     a corpus where every expansion matches a constant fraction
  *   - CAPPED: `maxCandidatesPerShape` pre-verify early termination
  *     in doc-key order (the accuracy trade — Lucene's docid-order
  *     early termination distributed)
  *   - PRUNED: `impactPruning` — impact-ordered EXACT pruning
  *     (MaxScore-family): bounded seed pass sets a per-shape
  *     threshold, only essential probe terms generate candidates,
  *     results bit-identical to EXACT
  *
  * and prints times plus top-1 overlap vs EXACT for both, so the
  * cost/recall trade is a number, not a claim (pruned overlap must
  * be 100% by construction).
  *
  * Timing discipline (ADVICE r13): a small UNTIMED warmup run of
  * each path first (JIT + the index's persisted frames), then the
  * timed runs ordered cheapest-first with EXACT LAST — any residual
  * warm-cache advantage then favors the baseline, making the
  * reported speedups conservative.
  *
  * Usage: runMain graft.tools.CappedExpandBench <sfDir> [cap]
  */
object CappedExpandBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CappedExpandBench <sfDir> [cap]")
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // bounded top-k aggregates (TopKAgg) over thousands of groups:
      // the 128-key default forces the sort-based object-agg fallback,
      // which serializes each group buffer per row (measured 155s /
      // 7.3GB spill on a 3.7M-row seed aggregate, SCALE.md r15)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.dsl._
    import graft.search.SearchIndex
    val idx = graft.search.SearchQueries.indexFor(spark, dir)
    val tk = col(SearchIndex.tokensColName("text"))
    def leftFor(mod: Int) = idx.docs.where(size(tk) >= 4 && col("doc_id") % mod === 0)
      .select(col("doc_id") +: (1 to 3).map(i => element_at(tk, i).as(s"t$i")): _*)
    val left = leftFor(10)
    def gen(r: org.apache.spark.sql.Row): SearchQuery = {
      def t(i: Int) = r.getAs[String](s"t$i")
      And(
        Boost(MatchWildcard("text", t(1).take(2) + "*"), 2.0),
        And(Or(MatchFuzzy("text", t(2), 1), MatchTerm("text", t(3))),
          Should(MatchWildcard("lang", "e*"))))
    }
    def run(l: org.apache.spark.sql.DataFrame, candCap: Int,
        pruned: Boolean): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val rows = idx.queryJoinAst(l, "doc_id", gen, "text", k = 3,
          excludeSelf = true, maxCandidatesPerShape = candCap,
          impactPruning = pruned)
        .where(col("rank") === 1)
        .select(col("qid"), col("key")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, rows.map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    // untimed warmup: a tiny left through every path (JIT, codegen
    // caches, the index's persisted canon/shape frames)
    val tiny = leftFor(50000).limit(4)
    run(tiny, cap, pruned = false)
    run(tiny, Int.MaxValue, pruned = true)
    run(tiny, Int.MaxValue, pruned = false)
    // timed, cheapest first, exact LAST (conservative ordering)
    val (cappedSec, cappedTop) = run(left, cap, pruned = false)
    val (prunedSec, prunedTop) = run(left, Int.MaxValue, pruned = true)
    val (exactSec, exactTop) = run(left, Int.MaxValue, pruned = false)
    val overlapCap = exactTop.count { case (q, k) => cappedTop.get(q).contains(k) }
    val overlapPr = exactTop.count { case (q, k) => prunedTop.get(q).contains(k) }
    spark.stop()
    def f(v: Double) = BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"metric":"capped_expand","dir":"$dir","cap":$cap,""" +
      s""""n_queries":${exactTop.size},"exact_sec":${f(exactSec)},""" +
      s""""capped_sec":${f(cappedSec)},"pruned_sec":${f(prunedSec)},""" +
      s""""top1_overlap":$overlapCap,"pruned_top1_overlap":$overlapPr}""")
    System.out.flush()
  }
}
