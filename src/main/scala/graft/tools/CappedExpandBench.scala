package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bounded-accuracy escape hatch for dense expansion
  * queries (SCALE.md): the same wildcard/fuzzy AST join as the
  * `query_join_ast_expand` entry, run exact vs with
  * `maxCandidatesPerShape` — pre-verify early termination in doc-key
  * order, the distributed analog of Lucene's docid-order early
  * termination. On a corpus where every expansion matches a constant
  * fraction of the documents, the exact run pays
  * |left| x Theta(corpus) verify work while the capped run's verified
  * volume is |shapes| x cap — this main prints both times and the
  * overlap of their top-1 hits so the cost/recall trade is a number,
  * not a claim.
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
    val left = idx.docs.where(size(tk) >= 4 && col("doc_id") % 10 === 0)
      .select(col("doc_id") +: (1 to 3).map(i => element_at(tk, i).as(s"t$i")): _*)
    def gen(r: org.apache.spark.sql.Row): SearchQuery = {
      def t(i: Int) = r.getAs[String](s"t$i")
      And(
        Boost(MatchWildcard("text", t(1).take(2) + "*"), 2.0),
        And(Or(MatchFuzzy("text", t(2), 1), MatchTerm("text", t(3))),
          Should(MatchWildcard("lang", "e*"))))
    }
    def run(candCap: Int): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val rows = idx.queryJoinAst(left, "doc_id", gen, "text", k = 3,
          excludeSelf = true, maxCandidatesPerShape = candCap)
        .where(col("rank") === 1)
        .select(col("qid"), col("key")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, rows.map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    val (exactSec, exactTop) = run(Int.MaxValue)
    val (cappedSec, cappedTop) = run(cap)
    val overlap = exactTop.count { case (q, k) => cappedTop.get(q).contains(k) }
    spark.stop()
    def f(v: Double) = BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"metric":"capped_expand","dir":"$dir","cap":$cap,""" +
      s""""n_queries":${exactTop.size},"exact_sec":${f(exactSec)},""" +
      s""""capped_sec":${f(cappedSec)},""" +
      s""""top1_overlap":$overlap}""")
    System.out.flush()
  }
}
