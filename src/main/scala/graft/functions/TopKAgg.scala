package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, SparkSession}

/** One (document, score) pair flowing through [[TopKAgg]]. */
case class ScoredDoc(key: Long, score: Double)

/** Bounded per-group top-k aggregate — the engine's replacement for
  * the reference's unbounded `groupByKey` + full sort per query (its
  * own `FIXME optimize`, reference DistributedIndexLuceneRDD.scala:
  * 160,286) and for its 2-pointer `merge` combiner
  * (utils/package.scala:16-40).
  *
  * An `Aggregator` compiles to a typed imperative aggregate with
  * partial aggregation: each map task keeps at most k rows per group
  * before the shuffle, so per-query state is O(k) regardless of corpus
  * size — the property that makes batch search / query join safe at
  * 100 TB.
  *
  * Ordering is deterministic: score descending, then key ascending.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredDoc, List[ScoredDoc], Array[ScoredDoc]] {
  require(k > 0, "k must be positive")

  override def zero: List[ScoredDoc] = Nil

  private def bound(xs: List[ScoredDoc]): List[ScoredDoc] =
    xs.sortBy(d => (-d.score, d.key)).take(k)

  override def reduce(buf: List[ScoredDoc], d: ScoredDoc): List[ScoredDoc] = {
    // fast reject without sorting when the buffer is full and d is
    // not better than the current worst
    if (buf.lengthCompare(k) >= 0) {
      val worst = buf.last
      if (d.score < worst.score || (d.score == worst.score && d.key > worst.key)) buf
      else bound(d :: buf)
    } else bound(d :: buf)
  }

  override def merge(a: List[ScoredDoc], b: List[ScoredDoc]): List[ScoredDoc] =
    bound(a ::: b)

  override def finish(buf: List[ScoredDoc]): Array[ScoredDoc] = buf.toArray

  override def bufferEncoder: Encoder[List[ScoredDoc]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[ScoredDoc]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column-API handle: `topk(k)(col("key"), col("score"))` yields
    * `array<struct<key,score>>` sorted score desc, key asc. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredDoc]())

  /** Optionally expose as a SQL function `topk_agg`. */
  def register(spark: SparkSession, k: Int, name: String = "topk_agg"): Unit =
    spark.udf.register(name, topk(k))
}
