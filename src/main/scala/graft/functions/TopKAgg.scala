package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, SparkSession}

/** One (document, score) pair flowing through [[TopKAgg]]. */
case class ScoredDoc[K](key: K, score: Double)

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
  * Generic over the document-key type `K` (an IndexSpec key is any
  * user-supplied stable column — long and string are the common
  * cases). Ordering is deterministic: score descending, then key
  * ascending by `K`'s own ordering.
  */
/** [[TopKAgg]] buffer: `sorted` holds the last compaction's top-≤k in
  * WORST-first order (so the O(1) rejection threshold is `head`),
  * `extra` the since-accepted rows, unsorted. List lengths are carried
  * (List.length is O(n)). */
case class TopKBuf[K](sorted: List[ScoredDoc[K]], nSorted: Int,
    extra: List[ScoredDoc[K]], nExtra: Int)

class TopKAgg[K: TypeTag](k: Int)(implicit ord: Ordering[K])
    extends Aggregator[ScoredDoc[K], TopKBuf[K], Array[ScoredDoc[K]]] {
  require(k > 0, "k must be positive")

  override def zero: TopKBuf[K] = TopKBuf(Nil, 0, Nil, 0)

  // BEST-first top-<=k of everything buffered (same ordering — score
  // desc, key asc — as the original sortBy-per-insert implementation)
  private def top(buf: TopKBuf[K]): List[ScoredDoc[K]] =
    (buf.sorted ::: buf.extra).sortBy(d => (-d.score, d.key)).take(k)

  private def compact(buf: TopKBuf[K]): TopKBuf[K] = {
    val t = top(buf)
    TopKBuf(t.reverse, t.length, Nil, 0)
  }

  override def reduce(buf: TopKBuf[K], d: ScoredDoc[K]): TopKBuf[K] = {
    // O(1) reject once the compacted prefix is full: d not better than
    // the worst of k already-kept rows can never make the top-k. The
    // old buffer (a List re-sortBy'd on EVERY accepted insert) was
    // O(B log B) per row while growing — quadratic-ish on partial
    // buffers that never fill, measured 106s of aggregation-build CPU
    // on a 1.9M-row seed scan spread over 96 partitions (r16).
    if (buf.nSorted >= k) {
      val worst = buf.sorted.head
      if (d.score < worst.score || (d.score == worst.score && ord.gt(d.key, worst.key)))
        return buf
    }
    val grown = TopKBuf(buf.sorted, buf.nSorted, d :: buf.extra, buf.nExtra + 1)
    // amortized O(log k)/row: one O(2k log 2k) sort per <=k accepts
    if (grown.nExtra >= math.max(k, 16)) compact(grown) else grown
  }

  override def merge(a: TopKBuf[K], b: TopKBuf[K]): TopKBuf[K] =
    compact(TopKBuf(a.sorted ::: b.sorted, a.nSorted + b.nSorted,
      a.extra ::: b.extra, a.nExtra + b.nExtra))

  override def finish(buf: TopKBuf[K]): Array[ScoredDoc[K]] = top(buf).toArray

  override def bufferEncoder: Encoder[TopKBuf[K]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[ScoredDoc[K]]] = ExpressionEncoder()
}

/** Bounded per-group bottom-n DISTINCT keys — the candidate-side
  * early-termination aggregate behind `maxCandidatesPerShape`
  * (SearchIndex.queryJoinAst): keeps the n smallest distinct keys of
  * a group, so a dense shape's Theta(corpus) candidate stream — with
  * duplicate (shape, key) rows from multi-term probes — reduces
  * map-side into O(n) buffers and exchanges |groups| rows of <= n
  * keys, with no global dedup exchange anywhere. Once a partial
  * buffer is full, every key >= its worst rejects in O(1), which is
  * the common case on a dense stream. Ordering/dedup by `K`'s own
  * ordering, so the kept set is deterministic (partition-independent)
  * and an external oracle can replay it. */
class BottomKDistinctAgg[K: TypeTag: scala.reflect.ClassTag](n: Int)(
    implicit ord: Ordering[K])
    extends Aggregator[K, List[K], Array[K]] {
  require(n > 0, "n must be positive")

  override def zero: List[K] = Nil

  private def bound(xs: List[K]): List[K] = xs.distinct.sorted.take(n)

  /** O(|buf|) sorted-distinct insert (single walk, no re-sort): the
    * accept path used to rebuild the list with distinct.sorted —
    * O(n log n) per accepted key, quadratic-ish map-side cost for a
    * LARGE cap (ADVICE r13). Still O(n) per accept; the dense-stream
    * common case stays the O(1) full-buffer rejection below. */
  private def insertSorted(buf: List[K], k: K): List[K] = {
    val b = List.newBuilder[K]
    var rest = buf
    var size = 0
    while (rest.nonEmpty && ord.lt(rest.head, k)) {
      b += rest.head; size += 1; rest = rest.tail
    }
    if (rest.nonEmpty && ord.equiv(rest.head, k)) buf // duplicate: unchanged
    else {
      b += k; size += 1
      while (rest.nonEmpty && size < n) {
        b += rest.head; size += 1; rest = rest.tail
      }
      b.result()
    }
  }

  override def reduce(buf: List[K], k: K): List[K] =
    // full buffer: k beyond (or equal to) the worst kept key can
    // neither enter nor change the set — reject without resorting
    if (buf.lengthCompare(n) >= 0 && ord.gteq(k, buf.last)) buf
    else insertSorted(buf, k)

  override def merge(a: List[K], b: List[K]): List[K] = bound(a ::: b)

  override def finish(buf: List[K]): Array[K] = buf.toArray

  override def bufferEncoder: Encoder[List[K]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[K]] = ExpressionEncoder()
}

object TopKAgg {
  /** Code-point string ordering == UTF-8 binary order, the order
    * Spark SQL sorts strings in. Java's natural `String` ordering
    * compares UTF-16 code units, which ranks supplementary-plane
    * characters (surrogate pairs, e.g. emoji) BELOW U+E000..U+FFFF —
    * a tie-break through it would disagree with the scan path's
    * `orderBy(key.asc)` at the k boundary. */
  private[functions] val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** Typed handle: `of[K](k)(col("key"), col("score"))` yields
    * `array<struct<key: K, score>>` sorted score desc, key asc. */
  def of[K: TypeTag: Ordering](k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg[K](k), ExpressionEncoder[ScoredDoc[K]]())

  /** Long-keyed variant (numeric doc ids). */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction = of[Long](k)

  /** String-keyed variant (e.g. uuid / natural-key doc ids);
    * tie-breaks in Spark's UTF-8 binary order. */
  def topkString(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    of[String](k)(scala.reflect.runtime.universe.typeTag[String], Utf8Ordering)

  /** Optionally expose as a SQL function `topk_agg`. */
  def register(spark: SparkSession, k: Int, name: String = "topk_agg"): Unit =
    spark.udf.register(name, topk(k))

  /** Long-keyed bottom-n distinct keys (see [[BottomKDistinctAgg]]). */
  def bottomkDistinct(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BottomKDistinctAgg[Long](n), ExpressionEncoder[Long]())

  /** String-keyed variant, UTF-8 binary order like [[topkString]]. */
  def bottomkDistinctString(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BottomKDistinctAgg[String](n)(
      scala.reflect.runtime.universe.typeTag[String],
      scala.reflect.classTag[String], Utf8Ordering),
      ExpressionEncoder[String]())
}
