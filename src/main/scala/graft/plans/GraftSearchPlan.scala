package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** SQL-visible search surface (SURVEY §7 Phase 3): the flagship
  * match+score+limit pipeline as ONE EXPLAIN-visible table function,
  * so thrift-server / Spark Connect SQL clients can run full-text
  * search without the Scala API:
  *
  * {{{
  *   SELECT doc_id, score
  *   FROM graft_search('/data/sf0.001', 'spark join', 10)
  * }}}
  *
  * Three pieces, all installed by [[graft.GraftExtensions]]:
  *  - the `graft_search(dir, raw_query, k)` TABLE function, resolving
  *    to a [[GraftSearchNode]] logical leaf;
  *  - [[GraftSearchStrategy]], planning that leaf into the fused
  *    [[GraftSearchExec]] probe operator (`EXPLAIN` shows
  *    `GraftSearch dir=..., query=..., k=...` — the whole probe is
  *    one visible node, not a scan+filter+sort+limit spread);
  *  - [[GraftSearchExec]] itself, which executes the library's
  *    postings-probe top-k (the same build-once cached index the
  *    Scala entries share — first use pays the index build, every
  *    later SQL query probes warm artifacts) and streams the k-row
  *    result out as its RDD.
  *
  * The raw string goes through the index's [[graft.dsl
  * .QueryConstructor]] ([[graft.search.SearchIndex.searchRaw]]), so
  * the full Parsed grammar — +required -excluded "phrases" wildcards
  * ranges boosts — is available from SQL. Scale shape: identical to
  * the Scala path (this is a front-end, not a second engine).
  */
object GraftSearchPlan {

  private val fnName = FunctionIdentifier("graft_search")

  private val info = new ExpressionInfo(GraftSearchNode.getClass.getName,
    null, "graft_search", "graft_search(dir, raw_query, k) - full-text " +
      "BM25 top-k over the corpus at `dir` using the library's search " +
      "index; raw_query uses the Parsed grammar.", "")

  /** TVF builder: literal args only (dir, query, k) — the standard
    * contract for source-defining table functions. */
  private def build(args: Seq[Expression]): LogicalPlan = {
    def fail(msg: String) = throw new IllegalArgumentException(
      s"graft_search(dir, raw_query, k): $msg")
    if (args.length != 3) fail(s"expected 3 arguments, got ${args.length}")
    def str(e: Expression, what: String): String = e match {
      case Literal(v, StringType) if v != null => v.toString
      case _ => fail(s"$what must be a string literal, got $e")
    }
    val dir = str(args(0), "dir")
    val raw = str(args(1), "raw_query")
    val k = args(2) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case e => fail(s"k must be an integer literal, got $e")
    }
    GraftSearchNode(dir, raw, k)
  }

  /** Entry point for [[graft.GraftExtensions]]. */
  def install(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectTableFunction((fnName, info, build))
    ext.injectPlannerStrategy(_ => new GraftSearchStrategy)
  }

  /** Runtime registration for a session that was built WITHOUT
    * `spark.sql.extensions` (interactive sessions you already hold):
    * installs the strategy through the public experimental hook. The
    * TVF itself needs build-time injection; sessions installing at
    * runtime use [[graft.search.SearchIndex.searchRaw]] directly. */
  def installStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[GraftSearchStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new GraftSearchStrategy
}

/** Logical leaf for a `graft_search` call: the whole match+score+
  * limit pipeline as one node. Output is (doc_id bigint, score
  * double) — carried as a FIELD so plan transforms/copies preserve
  * the analysis-time expression ids (a def/val regenerating
  * AttributeReferences per instance breaks downstream binding). */
final case class GraftSearchNode(dir: String, rawQuery: String, k: Int,
    output: Seq[Attribute] = GraftSearchNode.freshOutput())
    extends LeafNode {
  // k rows of (long, double): the node is always broadcast-sized
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(k.toLong.max(1L) * 24L))
  override def simpleString(maxFields: Int): String =
    s"GraftSearchNode dir=$dir, query='$rawQuery', k=$k"
}

object GraftSearchNode {
  private[plans] def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("doc_id", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

/** Plans [[GraftSearchNode]] into the fused probe operator. */
final class GraftSearchStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftSearchNode(dir, raw, k, out) =>
      GraftSearchExec(dir, raw, k, out) :: Nil
    case _ => Nil
  }
}

/** The fused index-probe physical operator: one EXPLAIN node covering
  * analyze → postings probe → BM25 score → top-k. Execution plans
  * the library's own search pipeline against the build-once cached
  * index ([[graft.search.SearchQueries.indexFor]]) and returns its
  * rows; the inner plan's stages run as ordinary Spark jobs, so
  * nothing about the probe's distribution changes — this operator is
  * the SQL front door, fused for visibility, not a bypass. */
final case class GraftSearchExec(dir: String, rawQuery: String, k: Int,
    output: Seq[Attribute]) extends LeafExecNode {
  override def simpleString(maxFields: Int): String =
    s"GraftSearch dir=$dir, query='$rawQuery', k=$k"
  override protected def doExecute(): RDD[InternalRow] = {
    // `session` is SparkPlan's own captured session (set at planning)
    val idx = graft.search.SearchQueries.indexFor(session, dir)
    idx.searchRaw(rawQuery, k)
      .select(col(idx.spec.keyCol).cast("long"), col("score").cast("double"))
      .queryExecution.toRdd
  }
}
