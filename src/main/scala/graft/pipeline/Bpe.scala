package graft.pipeline

import graft.analysis.Analyzers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Classic word-level byte-pair-encoding merge learning (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units", arXiv:1508.07909) — the tokenizer-training step of an LLM
  * data pipeline.
  *
  * Scale split: the ONLY corpus-sized computation is the word-
  * frequency vocabulary (one partial-aggregated groupBy + bounded
  * TakeOrdered — the same shape as [[Curation.vocabCoverage]]); the
  * merge loop itself runs on the driver over that CAPPED vocabulary,
  * the same bounded-vocab contract CCNet-style LMs use
  * ([[Curation.unigramLogprob]]): BPE quality saturates long before
  * the cap because pair statistics are dominated by frequent words,
  * and a 10^4-10^6-entry vocab is driver-trivial while the corpus
  * behind it can be 100 TB. [[tokenPairStats]] is the corpus-level
  * (uncapped, distributed) counting primitive for pipelines that
  * want exact whole-corpus pair counts per iteration instead.
  *
  * Determinism: every argmax tie breaks on (count desc, left asc,
  * right asc) and the vocab cap on (count desc, word asc), so learned
  * merges are reproducible across runs and partitionings.
  */
object Bpe {

  private def toks(c: org.apache.spark.sql.Column) = Analyzers.default.tokensCol(c)

  /** End-of-word marker (the paper's `</w>`): distinguishes "est" as
    * a suffix from "est" mid-word, and makes segmentations
    * concatenation-invertible. */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Distributed step: deterministic capped word-frequency vocabulary. */
  def wordVocab(spark: SparkSession, dir: String, vocabCap: Int = 10000): Seq[(String, Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabCap)
      .as[(String, Long)].collect().toSeq
  }

  /** Driver-side merge loop over a bounded vocabulary — pure and
    * deterministic; separated from [[learn]] so specs can feed the
    * published golden example directly. Stops early when no pair
    * occurs twice (merging singletons is meaningless). */
  def learnFromVocab(vocab: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    // word -> mutable symbol sequence (chars + end-of-word marker)
    var words: Vector[(Vector[String], Long)] = vocab.map { case (w, c) =>
      (w.map(_.toString).toVector :+ EndOfWord, c)
    }.toVector
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + cnt
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val ((l, r), c) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < 2) continue = false
        else {
          merges += Merge(rank, l, r, c)
          val joined = l + r
          words = words.map { case (syms, cnt) =>
            if (syms.length < 2) (syms, cnt)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += joined; i += 2 // greedy left-to-right, non-overlapping
                } else { out += syms(i); i += 1 }
              }
              (out.result(), cnt)
            }
          }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Learn `numMerges` merges from the corpus under `dir`. */
  def learn(spark: SparkSession, dir: String, numMerges: Int = 20,
      vocabCap: Int = 10000): Seq[Merge] =
    learnFromVocab(wordVocab(spark, dir, vocabCap), numMerges)

  /** Segments one word with learned merges, applying them in rank
    * order (the paper's encoding): lowest-rank applicable merge
    * first, greedy left-to-right within a rank. */
  def segment(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    merges.sortBy(_.rank).foreach { m =>
      if (syms.length >= 2) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
            out += (m.left + m.right); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** The learned merge table as a DataFrame (rank, left, right,
    * pair_count) — persistable alongside the corpus as tokenizer
    * metadata. */
  def mergesDf(spark: SparkSession, dir: String, numMerges: Int = 20,
      vocabCap: Int = 10000): DataFrame = {
    import spark.implicits._
    learn(spark, dir, numMerges, vocabCap)
      .map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Segmentation dictionary: every vocabulary word segmented once
    * with the learned merges — (word, pieces joined by space,
    * n_pieces). Driver cost O(vocab x merges), the same bounded-vocab
    * contract as [[learn]]; the result is the broadcastable artifact
    * a production tokenizer ships (one dictionary lookup per word at
    * encode time instead of re-running the merge loop per token). */
  def segmentationSeq(spark: SparkSession, dir: String, numMerges: Int = 20,
      vocabCap: Int = 10000): Seq[(String, String, Long)] = {
    val vocab = wordVocab(spark, dir, vocabCap)
    val merges = learnFromVocab(vocab, numMerges)
    vocab.map { case (w, _) =>
      val pcs = segment(w, merges)
      (w, pcs.mkString(" "), pcs.size.toLong)
    }
  }

  /** Recorded segmentation dictionaries, keyed by caller tag —
    * consumed by [[PipelineQueries]] to generate a DuckDB oracle that
    * verifies the DISTRIBUTED application against the same dictionary
    * (the merge loop itself is spec-covered golden-example territory,
    * like the KMeans fit behind the IVF oracle). */
  private val encodeRuns =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String, Long)]]
  private[pipeline] def recordedEncodeRun(tag: String): Option[Seq[(String, String, Long)]] =
    encodeRuns.get(tag)

  /** Distributed BPE encoding of the corpus with the trained
    * tokenizer: tokens posexplode map-side, one broadcast join to the
    * segmentation dictionary, per-doc reassembly in token order
    * (sort_array over (pos, pieces) structs — no window, one
    * exchange on doc_id). The dictionary covers the corpus by
    * construction when vocabCap exceeds the distinct word count; at
    * an open 100 TB vocabulary the cap keeps the broadcast bounded
    * and out-of-dictionary words would take a per-word segment()
    * fallback (flagged, not silently dropped — here the inner join is
    * exact because coverage is total).
    *
    * Output: (doc_id, n_pieces, pieces_md5). */
  def encode(spark: SparkSession, dir: String, numMerges: Int = 20,
      vocabCap: Int = 10000, recordAs: Option[String] = None): DataFrame = {
    import spark.implicits._
    val seg = segmentationSeq(spark, dir, numMerges, vocabCap)
    recordAs.foreach(tag => encodeRuns(tag) = seg)
    val segDf = seg.toDF("word", "pieces", "n_pieces")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(segDf), Seq("word"))
      .groupBy("doc_id")
      .agg(sum("n_pieces").as("n_pieces"),
        sort_array(collect_list(struct(col("pos"), col("pieces")))).as("ps"))
      .select(col("doc_id"), col("n_pieces"),
        md5(concat_ws(" ", transform(col("ps"), x => x.getField("pieces")))).as("pieces_md5"))
      .orderBy("doc_id")
  }

  /** Distributed decode of the BPE-encoded corpus back to text, as a
    * roundtrip proof: build each document's serialized piece stream
    * ("th e&lt;/w&gt; fa st&lt;/w&gt; ..."), then invert the tokenizer with
    * pure string ops — drop the piece boundaries (spaces), turn each
    * end-of-word marker back into a word boundary, trim. The result
    * must equal the analyzed text exactly, which is what the oracle
    * hashes (`decode(encode(x)) == analyze(x)` per document — the
    * invariant every production tokenizer ships with).
    *
    * Same distribution shape as [[encode]]: posexplode + one
    * broadcast dictionary join + one exchange on doc_id; the decode
    * itself is codegen'd `replace`/`rtrim` on the grouped row.
    * Documents with zero tokens have no encoded form and are absent,
    * matching the encode output. */
  def decodeRoundtrip(spark: SparkSession, dir: String, numMerges: Int = 20,
      vocabCap: Int = 10000): DataFrame = {
    import spark.implicits._
    val segDf = segmentationSeq(spark, dir, numMerges, vocabCap)
      .toDF("word", "pieces", "n_pieces")
    // LEFT join + in-row raise_error: if the corpus has more than
    // vocabCap distinct words the capped segmentation dictionary
    // cannot cover it, and silently dropping OOV tokens would make
    // the decoded text diverge from the oracle's full reconstruction.
    // Fail loudly instead of returning a subtly wrong roundtrip. The
    // check is fused into the consumed `pieces` column (not a
    // separate assert column Catalyst could prune away).
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(segDf.select("word", "pieces")), Seq("word"), "left")
      .withColumn("pieces",
        when(col("pieces").isNull, raise_error(concat(
          lit("BPE decodeRoundtrip: word out of segmentation vocabulary " +
            s"(vocabCap=$vocabCap): "), col("word"))))
          .otherwise(col("pieces")))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("pieces")))).as("ps"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("ps"), x => x.getField("pieces"))).as("piece_stream"))
      .select(col("doc_id"),
        rtrim(replace(replace(col("piece_stream"), lit(" "), lit("")),
          lit(EndOfWord), lit(" "))).as("decoded"))
      .orderBy("doc_id")
  }
}
