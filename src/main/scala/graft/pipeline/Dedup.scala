package graft.pipeline

import graft.analysis.Analyzers
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for large-scale training-data pipelines.
  *
  * No reference analog (the reference is a search engine); these are
  * the operators the task brief adds on top of SURVEY §2. All are
  * built shuffle-native for 100 TB:
  *
  *  - exact / normalized dedup: one hash `groupBy` (window over the
  *    hash), never an all-pairs compare;
  *  - MinHash+LSH: shingle → 16 md5-minhash signatures → 4 bands →
  *    band-bucket equi-join for candidates → exact Jaccard verify.
  *    Candidate generation is an equi-join on (band, bucket-hash), so
  *    cost scales with actual collisions, not n²;
  *  - n-gram Jaccard: candidates share at least one 5-shingle
  *    (inverted-index join), verified on the full shingle sets;
  *  - SimHash: 32-bit fingerprint via postings aggregation; near-dup
  *    pairs by byte-banding + Hamming-distance verify;
  *  - embedding near-dup: label-blocked cosine pairs (blocking key
  *    keeps the join co-partitioned; swap in LSH buckets when no
  *    natural blocking key exists — see [[Similarity]]).
  *
  * Hashes are md5 (Spark's codegen'd `md5`) so DuckDB oracles can
  * recompute identical signatures.
  */
object Dedup {

  private def toks(c: Column): Column = Analyzers.default.tokensCol(c)

  /** Registry of the build-once persisted intermediates (shingle
    * tables, band tables, simhash fingerprints, LSH-bucketed
    * corpora), keyed by operator+dir+params — the same contract as
    * [[Similarity.clearIvfCache]]: entries are bound to the building
    * SparkSession and assume the data under `dir` is immutable for
    * the process lifetime. Repeated calls reuse the persisted frame
    * instead of leaning on CacheManager plan-dedup, and
    * [[clearCaches]] releases them all. */
  private val persistRegistry =
    scala.collection.mutable.Map.empty[String, DataFrame]

  private def persistOnce(key: String)(build: => DataFrame): DataFrame =
    persistRegistry.synchronized {
      // lineage-cut, not bare persist (graft.sources.Frames): the
      // stream-static ingest joins re-plan the static side per
      // MICRO-BATCH, and batch dedup plans reference these frames
      // several times — a leaf keeps those plans and task closures
      // flat (r16; same barrier as the search index frames).
      // Deliberately built INSIDE the lock (ADVICE r16): cutLineage
      // runs Spark jobs while holding it, so a first-touch build
      // serializes concurrent lookups of OTHER keys — accepted,
      // because these are build-once-per-corpus registries (a miss
      // is paid once per process) and the alternative per-key
      // future/placeholder machinery buys nothing afterward. Same
      // policy in Similarity's lshCache and Urls' registries.
      persistRegistry.getOrElseUpdate(key,
        graft.sources.Frames.cutLineage(build, StorageLevel.MEMORY_AND_DISK))
    }

  /** Releases every registered dedup intermediate — required after
    * mutating a corpus dir in-place (mirror of
    * [[Similarity.clearIvfCache]]). */
  def clearCaches(): Unit = persistRegistry.synchronized {
    persistRegistry.values.foreach(graft.sources.Frames.release(_, blocking = true))
    persistRegistry.clear()
  }

  /** Distinct n-token shingles joined by single spaces; empty array
    * when the doc has fewer than n tokens. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** MinHash machinery: each shingle is hashed ONCE (md5 prefix →
    * 60-bit int → mod p), then the 16 signatures are affine
    * permutations `(a_i * h + b_i) mod p` of that single hash — the
    * classic universal-hashing MinHash construction. 16x less hashing
    * than hashing per signature, and every step is expressible in the
    * DuckDB oracle (`('0x' || substr(md5(s),1,15))::BIGINT`). */
  private[pipeline] val MinhashP = 2147483647L // 2^31 - 1 (prime)
  private[pipeline] val MinhashA: IndexedSeq[Long] =
    (0 until 16).map(i => (2654435761L * (i + 1)) % MinhashP)
  private[pipeline] val MinhashB: IndexedSeq[Long] =
    (0 until 16).map(i => (40503L * (i + 7) * (i + 7)) % MinhashP)

  /** Base shingle hash column: md5 prefix mod p, one per shingle. */
  private def shingleHashes(ss: Column): Column =
    transform(ss, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP)

  /** MinHash signature i over the pre-hashed shingle array. */
  private def minhashSig(hs: Column, i: Int): Column =
    array_min(transform(hs, h =>
      (lit(MinhashA(i)) * h + lit(MinhashB(i))) % MinhashP))

  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), toks(col("text")).as("tokens"))

  /** Exact dedup by full-content hash: every doc mapped to the
    * smallest doc_id sharing its md5(text). */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("h"))
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .orderBy("doc_id")
  }

  /** Normalized ("bag-of-words") dedup: hash of the sorted distinct
    * token set — catches reordered/duplicated-token copies. */
  def normalized(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("h"))
    docTokens(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(col("tokens"))))).as("h"))
      .select(col("doc_id"), min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .orderBy("doc_id")
  }

  /** MinHash+LSH near-dup pairs: 16 signatures, 4 bands x 4 rows,
    * verified 3-shingle Jaccard >= `threshold`. */
  /** Persisted (doc_id, shingle set, shingle hashes) table — shared
    * by every MinHash consumer. Persisted because it feeds candidate
    * generation and the verify join-back (twice each); without the
    * cut, Catalyst collapses tokenize+shingle into each consumer and
    * re-evaluates the interpreted lambda pipeline per use (measured
    * 15x slowdown). Persist BEFORE the size filter: predicate
    * pushdown would otherwise re-inline the whole tokenize+shingle
    * expression into the scan-level filter and evaluate it per row. */
  private def shingleTable(spark: SparkSession, dir: String): DataFrame =
    persistOnce(s"minhash_sh#$dir") {
      graft.functions.SearchExpressions.register(spark)
      docTokens(spark, dir)
        .select(col("doc_id"),
          call_function("shingle_strings", col("tokens"), lit(3)).as("ss"))
        .withColumn("hs", shingleHashes(col("ss"))) // hashed once, cached
    }.where(size(col("ss")) > 0)

  /** Persisted LSH band table (doc_id, band, band hash): 16
    * signatures in 4 bands x 4 rows over [[shingleTable]]. */
  private def bandTable(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleTable(spark, dir)
    val sigCols = (0 until 16).map(i => minhashSig(col("hs"), i).as(s"sig_$i"))
    val sigs = sh.select(col("doc_id") +: sigCols: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(r => col(s"sig_${b * 4 + r}")): _*)).as("bh"))
    }
    persistOnce(s"minhash_bands#$dir") {
      sigs
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
        .select(col("doc_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
    }
  }

  /** The persisted static-corpus LSH tables (bands, shingles) — the
    * "index" side of ingest-time dedup: a stream of arriving
    * documents joins these to find which corpus documents each new
    * arrival near-duplicates ([[graft.streaming.EventStreams
    * .nearDupVsCorpusStream]]). At 100 TB these are corpus-sized
    * DataFrames; persisting keeps micro-batches from rebuilding
    * them, and a production deployment would additionally bucket
    * them by the join key ((band, bh) / doc_id) on disk so each
    * micro-batch's equi-join shuffles only the arriving slice. */
  def corpusLshTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (bandTable(spark, dir), shingleTable(spark, dir))

  /** Per-bucket candidate DICTIONARY over the corpus LSH tables —
    * (band, bh, cands: array<(corpus_id, cnt, ssy)>), the static side
    * of a GRAIN-PRESERVING ingest near-dup check: an arriving doc
    * LEFT-joins one row per band (never explodes), so the stream
    * keeps one row per doc through the whole ingest DAG with no
    * re-aggregation (which would be a second state store).
    *
    * Hot-bucket escape (the r12-verdict stretch): candidates are
    * DEDUPED BY SHINGLE PROFILE before capping. The Jaccard verify
    * needs only the candidate's shingle set plus enough identity to
    * exclude self, and (min corpus_id, member count) carries exactly
    * that — a probe matches a profile iff `cnt > 1 OR corpus_id <>
    * doc_id` and the Jaccard clears the threshold (if the probe's own
    * entry is the group's only member, the group IS the probe; any
    * other membership implies a real near-duplicate). The decision is
    * therefore EXACTLY the all-pairs answer, while the degenerate
    * bucket that made the cap bite hardest — thousands of IDENTICAL
    * boilerplate docs sharing a band hash at crawl scale — collapses
    * to a handful of distinct-profile rows. The cap (still applied,
    * sorted by group-min corpus id) now only truncates a bucket with
    * more than `cap` DISTINCT near-colliding profiles, and that
    * residual case stays log-observable. */
  private[graft] def corpusBandCandidates(spark: SparkSession, dir: String,
      cap: Int = 1024): DataFrame =
    persistOnce(s"minhash_bandcands#$dir#$cap") {
      val (bands, sh) = corpusLshTables(spark, dir)
      val grouped = bands
        .join(sh.select(col("doc_id"), col("ss")), Seq("doc_id"))
        .groupBy(col("band"), col("bh"), col("ss"))
        .agg(min(col("doc_id")).as("corpus_id"), count(lit(1)).as("cnt"))
        .groupBy(col("band"), col("bh"))
        .agg(sort_array(collect_list(struct(
          col("corpus_id"), col("cnt"), col("ss").as("ssy")))).as("__all"))
      // residual truncation (> cap DISTINCT profiles in one bucket)
      // would still be silent divergence from the batch oracle: count
      // affected buckets once at build time (the frame is build-once)
      // and warn with the count, so at-scale drift is observable in
      // the logs, not a mystery
      val nOver = grouped.where(size(col("__all")) > cap).count()
      if (nOver > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"corpusBandCandidates($dir): $nOver LSH bucket(s) over cap=$cap " +
            "distinct shingle profiles — stream-vs-corpus near-dup checks " +
            "are truncated in those buckets")
      grouped.select(col("band"), col("bh"),
        slice(col("__all"), 1, cap).as("cands"))
    }

  /** [[corpusBandCandidates]] pre-split into its four per-band
    * dictionaries, each lineage-cut with an honest size and
    * pre-partitioned + sorted by the probe join key `bh` (r17).
    * Why: the ingest DAG's four stream-static band joins re-planned
    * against the ONE whole-dictionary frame, whose honest size
    * (4 bands together) sat above the broadcast threshold — so every
    * micro-batch re-shuffled AND re-sorted the static dictionary
    * four times (measured: four 13-task ~4MB exchange stages per
    * batch). Per band the frame is a quarter the size: at bench SFs
    // it broadcasts (zero exchange on either side of the join) and
    * at corpus scale, where it cannot, the baked-in hash
    * partitioning + bh ordering make the static side exchange- and
    * sort-free anyway. Width is defaultParallelism — explicit so
    * AQE's byte-based coalescing cannot fold it (scale-adaptive, not
    * a local constant). */
  private[graft] def corpusBandCandidatesByBand(spark: SparkSession,
      dir: String, cap: Int = 1024): IndexedSeq[DataFrame] = {
    val full = corpusBandCandidates(spark, dir, cap)
    (0 until 4).map(b => persistOnce(s"minhash_bandcands#$dir#$cap#band$b") {
      full.where(col("band") === b).select(col("bh"), col("cands"))
        .repartition(spark.sparkContext.defaultParallelism, col("bh"))
        .sortWithinPartitions("bh")
    })
  }

  /** The in-row verify over a [[corpusBandCandidates]] candidate
    * array: true iff some profile GROUP contains a doc other than the
    * probe (cnt > 1, or a min id that is not the probe) and its
    * Jaccard with the probe's shingles clears `thr`. Exactly the
    * all-pairs decision (see the dictionary's scaladoc), factored so
    * the ingest DAG and the hot-bucket property spec share it. */
  private[graft] def profileMatchExpr(cands: Column, ss: Column,
      docId: Column, thr: Double): Column =
    coalesce(exists(cands, c =>
      (c.getField("cnt") > 1 || c.getField("corpus_id") =!= docId) &&
        size(array_intersect(ss, c.getField("ssy"))).cast("double") /
          size(array_union(ss, c.getField("ssy"))) >= thr),
      lit(false))

  /** Non-exploded ingest-side banding: adds `ss` plus the four band
    * hashes `bh_0..bh_3` as COLUMNS (same signatures/band hashes as
    * [[streamBands]], which explodes), preserving every input column
    * — the shape [[corpusBandCandidates]]' per-band left joins need.
    * Docs with no shingles keep null-sig hashes; callers must guard
    * the verify on `size(ss) > 0` (the exploded path drops them). */
  private[graft] def withBandColumns(d: DataFrame, tokens: Column): DataFrame = {
    graft.functions.SearchExpressions.register(d.sparkSession)
    val withSs = d
      .withColumn("ss", call_function("shingle_strings", tokens, lit(3)))
      .withColumn("__hs", shingleHashes(col("ss")))
    val withSigs = (0 until 16).foldLeft(withSs)((acc, i) =>
      acc.withColumn(s"__sig_$i", minhashSig(col("__hs"), i)))
    (0 until 4).foldLeft(withSigs)((acc, b) =>
      acc.withColumn(s"bh_$b",
        md5(concat_ws("|", (0 until 4).map(r => col(s"__sig_${b * 4 + r}")): _*))))
      .drop((0 until 16).map(i => s"__sig_$i") :+ "__hs": _*)
  }

  /** Persists the corpus LSH tables as HASH-BUCKETED catalog tables —
    * the on-disk layout the [[corpusLshTables]] scaladoc promises for
    * a 100 TB deployment: bands bucketed+sorted by the candidate
    * join's (band, bh) key and shingles by the verify join's doc_id
    * key, so every ingest micro-batch's stream-static equi-joins read
    * co-located buckets with NO exchange on the corpus side — only
    * the arriving slice shuffles, whatever the corpus size. Returns
    * the (bands, shingles) table names; read them back with
    * `spark.table` and hand them to
    * [[graft.streaming.EventStreams.nearDupVsCorpusStream]].
    *
    * An orphaned warehouse directory from a previous process (the
    * in-memory catalog forgets tables between JVMs; the files
    * remain) is deleted before the write. */
  def saveBucketedLshTables(spark: SparkSession, dir: String,
      prefix: String = "graft_lsh", nBuckets: Int = 32): (String, String) = {
    val (bands, sh) = corpusLshTables(spark, dir)
    def write(df: DataFrame, table: String, keys: Seq[String]): Unit = {
      if (!spark.catalog.tableExists(table)) {
        // resolve through the Hadoop FileSystem API: works for any
        // warehouse scheme (file:, hdfs:, s3a:) where string-stripping
        // "file:" would silently miss or hit a wrong local path
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .bucketBy(nBuckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .saveAsTable(table)
    }
    val bt = s"${prefix}_bands"
    val st = s"${prefix}_shingles"
    write(bands, bt, Seq("band", "bh"))
    write(sh.select("doc_id", "ss"), st, Seq("doc_id"))
    (bt, st)
  }

  /** Map-side MinHash banding of a (possibly streaming) document
    * frame: doc_id, shingle set, and one row per (band, band-hash) —
    * the SAME shingle/signature/band construction as the batch
    * tables, shared so stream- and corpus-side signatures agree by
    * construction. Stateless (fingerprinting is doc-local), so it
    * keeps the stream side of an ingest-dedup join watermark-free. */
  def streamBands(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // The shingle set MUST be built by the one-pass native expression
    // from a materialized `tokens` attribute: inlining `toks(text)`
    // into the Column-level shingle lambda makes Catalyst re-tokenize
    // the document per shingle element (measured 25s/5k-doc
    // micro-batches — see [[graft.functions.ShingleStrings]]).
    graft.functions.SearchExpressions.register(docs.sparkSession)
    val base = docs
      .select(col("doc_id"), toks(col(textCol)).as("tokens"))
      .select(col("doc_id"),
        call_function("shingle_strings", col("tokens"), lit(3)).as("ss"))
      .where(size(col("ss")) > 0)
      .withColumn("hs", shingleHashes(col("ss")))
    val sigCols = (0 until 16).map(i => minhashSig(col("hs"), i).as(s"sig_$i"))
    val sigs = base.select(col("doc_id") +: col("ss") +: sigCols: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(r => col(s"sig_${b * 4 + r}")): _*)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("ss"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("ss"), col("bd.band").as("band"), col("bd.bh").as("bh"))
  }

  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.6): DataFrame = {
    val sh = shingleTable(spark, dir)
    val bands = bandTable(spark, dir)
    val a = bands.select(col("doc_id").as("x"), col("band"), col("bh"))
    val b = bands.select(col("doc_id").as("y"), col("band"), col("bh"))
    val cand = a.join(b, Seq("band", "bh")).where(col("x") < col("y"))
      .select("x", "y").distinct()
    val sa = sh.select(col("doc_id").as("x"), col("ss").as("ssx"))
    val sb = sh.select(col("doc_id").as("y"), col("ss").as("ssy"))
    cand.join(sa, "x").join(sb, "y")
      .withColumn("jaccard",
        size(array_intersect(col("ssx"), col("ssy"))).cast("double") /
          size(array_union(col("ssx"), col("ssy"))))
      .where(col("jaccard") >= threshold)
      .select(col("x").as("doc_a"), col("y").as("doc_b"),
        graft.functions.Rounding.roundEven(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact duplicated-substring spans (the "exact substring dedup" of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499): flag every k-token window
    * whose exact text occurs MORE THAN ONCE corpus-wide (including
    * repeats within one document), merge overlapping/adjacent flagged
    * windows into maximal duplicated spans per document, and report
    * per-doc span counts and the duplicated-token fraction — the
    * removal signal a pipeline applies before training (docs with
    * dup_frac 1.0 are whole-doc dups; partial spans are boilerplate
    * headers/footers the doc-level dedups cannot see).
    *
    * Scale shape (the published suffix-array formulation is
    * single-node; this is the distributed-hash equivalent used at
    * corpus scale):
    *  - one codegen'd [[graft.functions.GramHashes]] pass emits a
    *    positional 60-bit hash per window — longs, not strings, move
    *    through every downstream exchange;
    *  - duplicated-window detection is ONE hash-keyed count aggregate
    *    (partial map-side combine, uniform md5 key → no skew) and the
    *    flag join-back is a long equi-join; never all-pairs;
    *  - span merging is a window over (doc_id, pos) — state bounded
    *    by one document's flagged windows, the classic
    *    interval-islands pattern (running max of span end, new island
    *    when the next start clears it);
    *  - the gram stream is deliberately NOT persisted: it is
    *    corpus-token-sized, and re-deriving it map-side for the
    *    join-back is cheaper at 100 TB than caching it.
    * 60-bit hashes make a false duplicate collision ~n²/2^61; at
    * trillion-gram scale swap in a 128-bit digest (same plan shape).
    */
  /** (doc_id, tokens, n_tokens) with the positional gram-hash array —
    * shared base of the substring-dedup family. */
  private def gramBase(spark: SparkSession, dir: String, k: Int): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), toks(col("text")).as("tokens"))
      .select(col("doc_id"), col("tokens"), size(col("tokens")).as("n_tokens"),
        call_function("gram_hashes", col("tokens"), lit(k)).as("ghs"))
  }

  /** Maximal merged duplicated spans (doc_id, s, e): every k-token
    * window occurring >1x corpus-wide, merged per doc by the
    * interval-islands window. */
  private def dupSpanTable(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val grams = gramBase(spark, dir, k)
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("pos", "h")))
    val dup = grams.groupBy("h").agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1).select("h")
    val flagged = grams.join(dup, "h").select("doc_id", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("prev_end",
        max(col("pos") + k).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("span", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span"))
      .agg(min("pos").as("s"), max(col("pos") + k).as("e"))
  }

  def substringSpans(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val perDoc = dupSpanTable(spark, dir, k).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("e") - col("s")).as("dup_tokens"))
    gramBase(spark, dir, k).select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          graft.functions.Rounding.roundEven(
            coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"), 4))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  /** The TRANSFORM of [[substringSpans]]: the cleaned corpus with
    * every duplicated span removed (what Lee et al. 2022 train on).
    * Span lists are per-doc tiny (merged islands), so the strip is a
    * doc_id equi-join plus one in-row filter over the token array —
    * nothing new is corpus-scaled beyond the span derivation itself.
    * Emits (doc_id, n_tokens, n_kept, cleaned_md5); `cleaned_md5`
    * fingerprints the kept-token text so the oracle can verify the
    * exact surviving content without shipping it. */
  def stripDuplicatedSpans(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val spansPerDoc = dupSpanTable(spark, dir, k)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    gramBase(spark, dir, k).select(col("doc_id"), col("tokens"), col("n_tokens"))
      .join(spansPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        filter(col("tokens"), (t, i) =>
          !exists(coalesce(col("spans"),
              array().cast("array<struct<s:int,e:int>>")),
            sp => i >= sp.getField("s") && i < sp.getField("e"))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("kept"))).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** Static corpus gram-statistics table for INGEST-TIME substring
    * dedup (the online complement of [[substringSpans]], same shape
    * as [[corpusLshTables]]): one row per distinct k-gram hash with
    * its distinct-document count and owner witness. Persisted; a
    * production deployment buckets it by `h` on disk
    * ([[saveBucketedLshTables]] pattern) so each micro-batch join
    * reads co-located buckets. */
  def corpusGramTable(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    persistOnce(s"gram_stats#$k#$dir") {
      gramBase(spark, dir, k)
        .select(col("doc_id"), explode(col("ghs")).as("h"))
        .groupBy("h")
        .agg(count_distinct(col("doc_id")).as("n_docs"), min("doc_id").as("min_doc"))
    }

  /** Positional gram hashes of a (possibly streaming) document frame —
    * stateless, watermark-free; the arriving side of ingest-time
    * substring dedup. */
  def streamGrams(docs: DataFrame, textCol: String = "text", k: Int = 8): DataFrame = {
    graft.functions.SearchExpressions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), toks(col(textCol)).as("tokens"))
      .select(col("doc_id"),
        posexplode(call_function("gram_hashes", col("tokens"), lit(k))).as(Seq("pos", "h")))
  }

  /** Fuzzy train/eval decontamination: MinHash-LSH restricted to
    * TRAIN x EVAL candidate pairs — the document-level fuzzy
    * complement of [[Curation.decontaminate]]'s exact n-gram overlap
    * (a paraphrased or lightly-edited benchmark document shares few
    * exact 5-grams but most of its 3-shingle set; near-dup detection
    * against the eval split is how published pipelines catch it).
    * Same split convention as decontaminate (doc_id % 20 == 0 is
    * eval), same signatures/bands as [[minhashLsh]] — the persisted
    * shingle and band tables are SHARED with the self-join dedup, so
    * a pipeline running both pays the hashing once.
    *
    * Scale shape: band-bucket equi-join (never all-pairs), candidate
    * volume additionally bounded by |eval| x bucket collision rate —
    * the eval side of a real pipeline is tiny and broadcastable, and
    * the output aggregate is keyed by train doc with O(1) state
    * (count / max / min — no pair list retained).
    *
    * Output per CONTAMINATED train doc: how many eval docs it
    * near-duplicates at `threshold`, the maximum verified Jaccard,
    * and the smallest matching eval id (deterministic witness). */
  def crossDecontaminate(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingleTable(spark, dir)
    val bands = bandTable(spark, dir)
    val tb = bands.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("train_id"), col("band"), col("bh"))
    val eb = bands.where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("eval_id"), col("band"), col("bh"))
    val cand = tb.join(eb, Seq("band", "bh"))
      .select("train_id", "eval_id").distinct()
    val st = sh.select(col("doc_id").as("train_id"), col("ss").as("sst"))
    val se = sh.select(col("doc_id").as("eval_id"), col("ss").as("sse"))
    cand.join(st, "train_id").join(se, "eval_id")
      .withColumn("jaccard",
        size(array_intersect(col("sst"), col("sse"))).cast("double") /
          size(array_union(col("sst"), col("sse"))))
      .where(col("jaccard") >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        graft.functions.Rounding.roundEven(max(col("jaccard")), 4).as("max_jaccard"),
        min(col("eval_id")).as("first_eval_id"))
      .orderBy("train_id")
  }

  /** n-gram Jaccard near-dup: candidates share >= 1 exact 5-shingle
    * (posting-style equi-join), verified 5-shingle Jaccard.
    *
    * `maxShingleDf` is the hot-shingle cap (standard common-shingle
    * filter): shingles occurring in more than that many docs are
    * dropped BEFORE the candidate join. Without it one boilerplate
    * shingle (header/footer text) shared by df docs contributes df^2
    * candidate pairs — the quadratic blowup that kills this operator
    * on real corpora at scale. A true near-dup pair loses candidacy
    * only if ALL its shared shingles are corpus-boilerplate, in which
    * case minhash banding (df-independent) is the right recall
    * backstop. The verify stage still uses the FULL shingle sets, so
    * surviving pairs' Jaccard values are uncapped. */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.3,
      maxShingleDf: Int = 100): DataFrame = {
    // shingles travel as 60-bit md5-prefix hashes (the native
    // [[graft.functions.ShingleHashes]] pass — one codegen'd scan, and
    // the inverted index / candidate join / verify arrays move 8-byte
    // longs, never ~40-char shingle strings; at corpus scale that is
    // ~6x less shuffle). Sets are distinct-by-hash in BOTH engines, so
    // a collision cannot desync the Jaccard counts. Persisted before
    // the filter for the same expression-collapse reason as minhashLsh.
    graft.functions.SearchExpressions.register(spark)
    val sh = persistOnce(s"ngram_sh#$dir") {
      docTokens(spark, dir)
        .select(col("doc_id"),
          call_function("shingle_hashes", col("tokens"), lit(5)).as("ss"))
    }.where(size(col("ss")) > 0)
    val inv = sh.select(col("doc_id"), explode(col("ss")).as("s"))
    // df per shingle (shingles are distinct per doc, so count = df).
    // Anti-join against the HOT set rather than semi-join against the
    // cool set: hot shingles (df > cap) are a tiny fraction of the
    // dictionary, so AQE broadcasts the build side and the posting
    // list never re-shuffles for the cap.
    val hot = inv.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") > maxShingleDf).select("s")
    val capped = inv.join(hot, Seq("s"), "left_anti")
    val cand = capped.select(col("doc_id").as("x"), col("s"))
      .join(capped.select(col("doc_id").as("y"), col("s")), "s")
      .where(col("x") < col("y"))
      .select("x", "y").distinct()
    val sa = sh.select(col("doc_id").as("x"), col("ss").as("ssx"))
    val sb = sh.select(col("doc_id").as("y"), col("ss").as("ssy"))
    cand.join(sa, "x").join(sb, "y")
      .withColumn("jaccard",
        size(array_intersect(col("ssx"), col("ssy"))).cast("double") /
          size(array_union(col("ssx"), col("ssy"))))
      .where(col("jaccard") >= threshold)
      .select(col("x").as("doc_a"), col("y").as("doc_b"),
        graft.functions.Rounding.roundEven(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MOSS-style near-dup pairs over WINNOWED fingerprints (Schleimer
    * et al. 2003, "Winnowing: Local Algorithms for Document
    * Fingerprinting" — the plagiarism-detection selection already
    * exposed per-doc by [[TextAnalysis.winnowing]]): candidates share
    * at least one winnowing-SELECTED shingle hash, then verify
    * Jaccard over the full selected sets. The selection guarantee
    * (every shared run of >= w+n-1 tokens shares a selected hash)
    * makes the inverted index ~1/w the size of [[ngramJaccard]]'s
    * full-shingle index — same candidate-equi-join shape, smaller
    * index, the classic recall/cost dial between the two.
    * Hot-hash df cap as in [[ngramJaccard]] (boilerplate minima would
    * otherwise flood the candidate join at df² cost). */
  def winnowPairs(spark: SparkSession, dir: String, threshold: Double = 0.5,
      n: Int = 5, w: Int = 4, maxHashDf: Int = 100): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val sel = persistOnce(s"winnow_sel#$n#$w#$dir") {
      docTokens(spark, dir)
        .select(col("doc_id"),
          call_function("winnow_hashes", col("tokens"), lit(n), lit(w)).as("sel"))
    }.where(size(col("sel")) > 0)
    val inv = sel.select(col("doc_id"), explode(col("sel")).as("h"))
    val hot = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > maxHashDf).select("h")
    val capped = inv.join(hot, Seq("h"), "left_anti")
    val cand = capped.select(col("doc_id").as("x"), col("h"))
      .join(capped.select(col("doc_id").as("y"), col("h")), "h")
      .where(col("x") < col("y"))
      .select("x", "y").distinct()
    val sa = sel.select(col("doc_id").as("x"), col("sel").as("sx"))
    val sb = sel.select(col("doc_id").as("y"), col("sel").as("sy"))
    cand.join(sa, "x").join(sb, "y")
      .withColumn("n_shared", size(array_intersect(col("sx"), col("sy"))))
      .withColumn("winnow_jaccard",
        col("n_shared").cast("double") / size(array_union(col("sx"), col("sy"))))
      .where(col("winnow_jaccard") >= threshold)
      .select(col("x").as("doc_a"), col("y").as("doc_b"),
        col("n_shared").cast("long").as("n_shared"),
        graft.functions.Rounding.roundEven(col("winnow_jaccard"), 4).as("winnow_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Resolves near-duplicate PAIRS into duplicate CLUSTERS: each doc
    * connected (transitively) through the pair graph maps to its
    * component's minimum id — the canonical survivor a training-data
    * pipeline keeps. This is the step after any pair generator
    * ([[minhashLsh]], [[simhashPairs]], [[embeddingPairsLsh]]):
    * without it, transitive groups (a~b, b~c) keep the wrong docs.
    *
    * Min-label propagation + pointer jumping over bidirectional
    * edges: every round each node takes the min of its own component
    * label and its neighbours' (one equi-join + partial-aggregated
    * `min`), then jumps to its label's label (one more equi-join) —
    * the jump halves the remaining label-chain depth, so convergence
    * is O(log diameter) rounds: `maxIters` = 20 covers any realistic
    * component. Each round eagerly localCheckpoints its labels —
    * materializing them AND truncating the plan, without which the
    * jump's self-join doubles the lineage every round — and the only
    * driver work is a changed-row count. Storage: superseded rounds'
    * checkpoints are reclaimed by GC + ContextCleaner, not
    * synchronously, so worst-case pinned storage is one label table
    * per executed round — acceptable because a label row is two
    * longs per PAIRED doc (orders of magnitude under the corpus) and
    * rounds are log(diameter), 2-4 in practice. localCheckpoint also
    * trades executor-loss recomputability for bounded plans — on an
    * unreliable cluster, rerun the operator (it is deterministic).
    * If the iteration bound is ever hit, the unconverged fixpoint is
    * flagged on stderr rather than returned silently.
    *
    * Output: (doc_id, canonical) for every doc that appears in at
    * least one pair; singletons are their own canonical and are
    * omitted (join back with a left join + coalesce to cover them).
    */
  def resolveClusters(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // Each round ends in an EAGER localCheckpoint: it materializes
    // the round's labels AND truncates the logical plan. Without the
    // truncation the jump's self-join doubles the plan every round
    // (2^rounds nodes — the classic iterative-algorithm lineage
    // blowup); superseded checkpoint blocks are reclaimed by the
    // ContextCleaner once the next round rebinds `labels`.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("id")).agg(min(col("comp")).as("nbr_comp"))
      val prop = labels.withColumnRenamed("comp", "prev")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("prev"),
          least(col("prev"), coalesce(col("nbr_comp"), col("prev"))).as("comp"))
      // pointer jump: comp := comp(comp). Every label is itself a
      // node id present in `prop`, so the left join always resolves;
      // the jump is what makes convergence logarithmic in diameter.
      val lookup = prop.select(col("id").as("__jid"), col("comp").as("__jcomp"))
      val next = prop.join(lookup, prop("comp") === col("__jid"), "left")
        .select(prop("id"), prop("prev"),
          coalesce(col("__jcomp"), prop("comp")).as("comp"))
        .localCheckpoint(true)
      converged = next.where(col("comp") < col("prev")).count() == 0L
      labels = next.select("id", "comp")
      it += 1
    }
    if (!converged)
      System.err.println(s"[graft] resolveClusters: fixpoint not reached after " +
        s"$maxIters rounds — component labels may be split; raise maxIters")
    // the fixpoint is already checkpointed (no lineage back through
    // the rounds), so the edge cache can be released before returning
    val out = labels.select(col("id").as("doc_id"), col("comp").as("canonical"))
    edges.unpersist()
    out.orderBy("doc_id")
  }

  /** MinHash-pair clusters for a corpus dir, computed once per
    * process (registry contract of [[clearCaches]]) — the fixpoint is
    * iterative, so callers sharing a corpus (cluster listing + the
    * kept-set derivation) should not each re-run it. */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    persistOnce(s"clusters#$dir")(resolveClusters(minhashLsh(spark, dir)))

  /** Keeps one document per duplicate cluster: drops every doc whose
    * cluster canonical is a different doc (anti join — corpus-sized
    * side never builds a hash table; the dropped-ids side is ≤ the
    * pair count). Singletons and cluster minima survive. */
  def dropClusteredDuplicates(corpus: DataFrame, clusters: DataFrame,
      keyCol: String): DataFrame =
    corpus.join(
      clusters.where(col("doc_id") =!= col("canonical"))
        .select(col("doc_id").as("__dup_id")),
      corpus(keyCol) === col("__dup_id"), "left_anti")

  /** 64-bit SimHash fingerprint per document, computed from the
    * term-frequency postings (one explode + one groupBy with 64
    * partial-aggregated bit sums — no per-doc UDF state).
    *
    * The 64-bit term hash is taken as two 32-bit md5 prefix halves
    * (bits 0-31 from hex chars 9-16, bits 32-63 from chars 1-8) so
    * the DuckDB oracle can replicate it without 64-bit hex→int
    * conversion edge cases. Bit 63's weight is Long.MinValue; the
    * assemble sum adds it last (ascending j), so every partial sum
    * stays in range under ANSI arithmetic. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // a fingerprint is doc-local state: the codegen'd simhash64
    // expression computes it in ONE map-side pass (same tf model,
    // same md5 hex-half hashes, same sign assembly — the SQL oracle
    // is unchanged). The previous aggregate formulation shuffled the
    // corpus twice: a (doc, term) tf group-by, then a 64-column
    // per-doc bit-sum aggregate.
    graft.functions.SearchExpressions.register(spark)
    // tokenless docs (all-punctuation text) produce no (term, bit)
    // evidence: the aggregate formulation and the SQL oracle's
    // explode/unnest both yield NO row for them, so the map-side
    // rewrite must drop them too rather than emit fingerprint 0
    // (which would pair every empty doc as a hamming-0 near-dup)
    docTokens(spark, dir)
      .where(size(col("tokens")) > 0)
      .select(col("doc_id"),
        call_function("simhash64", col("tokens")).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: banding (4 bands of 16 bits) + Hamming
    * verify <= `maxHamming`.
    *
    * Recall guarantee: with 4 bands, pigeonhole forces a shared
    * identical band only when Hamming <= 3 — so the default radius is
    * 3 and the banded candidate set is EXACT (every Hamming<=3 pair
    * is found). A larger radius r makes banding approximate: a pair
    * whose differing bits touch all 4 bands is missed. To search a
    * wider radius, raise the band count (8 8-bit bands of the same
    * 64-bit fingerprint cover Hamming <= 7) rather than `maxHamming`
    * alone.
    *
    * Bucket sizing at scale: each (band_pos, band_val) bucket holds
    * ~n/2^16 docs under a uniform fingerprint model, and the verify
    * join is quadratic INSIDE a bucket — at 10^9 docs that is ~15k
    * docs/bucket (~10^8 candidate pairs per band before the cheap
    * bit_count verify), the workable edge. The previous 8-bit bands
    * put 4M docs in a bucket at that scale (10^13 pairs — unrunnable);
    * 16-bit bands buy 256x smaller buckets at zero recall cost. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sims = persistOnce(s"simhash#$dir")(simhash(spark, dir))
    val byBand = sims.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_pos"),
            shiftright(col("simhash"), b * 16).bitwiseAND(65535).as("band_val"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band_pos").as("band_pos"), col("bb.band_val").as("band_val"))
    val a = byBand.select(col("doc_id").as("x"), col("simhash").as("sx"),
      col("band_pos"), col("band_val"))
    val b = byBand.select(col("doc_id").as("y"), col("simhash").as("sy"),
      col("band_pos"), col("band_val"))
    a.join(b, Seq("band_pos", "band_val")).where(col("x") < col("y"))
      .select("x", "y", "sx", "sy").distinct()
      .withColumn("hamming", bit_count(col("sx").bitwiseXOR(col("sy"))))
      .where(col("hamming") <= maxHamming)
      .select(col("x").as("doc_a"), col("y").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shared tail of the embedding near-dup operators: same-block
    * candidate pairs via equi-join on `blockCol`, cosine verify,
    * threshold, deterministic order. One definition so the label- and
    * LSH-blocked variants (and their oracles) cannot drift. */
  private def blockedCosinePairs(e: DataFrame, blockCol: String,
      threshold: Double): DataFrame = {
    val a = e.select(col("vec_id").as("x"), col("v").as("vx"), col("nrm").as("nx"), col(blockCol))
    val b = e.select(col("vec_id").as("y"), col("v").as("vy"), col("nrm").as("ny"), col(blockCol))
    a.join(b, blockCol).where(col("x") < col("y"))
      .withColumn("cos",
        call_function("vec_dot", col("vx"), col("vy")) / (col("nx") * col("ny")))
      .where(col("cos") >= threshold)
      .select(col("x").as("vec_a"), col("y").as("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** Embedding near-dup with LSH-bucket blocking — the scale path
    * when no natural blocking key (label/source/domain) exists: each
    * vector lands in a sign-bit hyperplane bucket, candidate pairs
    * come from a bucket equi-join, cosine verifies. Recall < 1 by
    * construction (near-dups can straddle a hyperplane); raise
    * recall with fewer planes (bigger buckets) or multiple
    * independent bucket tables OR-ed together. The bucketed corpus
    * persists for the pair join's two consumers (registered
    * build-once artifact, released by [[clearCaches]] — small:
    * ids+vectors+one long). */
  def embeddingPairsLsh(spark: SparkSession, dir: String, threshold: Double = 0.4,
      nPlanes: Int = 8): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val planes = Similarity.hyperplanes(nPlanes, 64)
    val e = persistOnce(s"emb_lsh#$dir#$nPlanes") {
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
        .withColumn("bucket", Similarity.lshBucket(col("v"), planes))
    }
    blockedCosinePairs(e, "bucket", threshold)
  }

  /** Embedding near-dup: label-blocked cosine pairs >= `threshold`.
    * The blocking key turns the n² problem into per-block joins that
    * co-partition on a shuffle key — when no natural key exists, use
    * [[embeddingPairsLsh]]. */
  def embeddingPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
      .withColumn("nrm", Similarity.norm(col("v")))
    blockedCosinePairs(e, "label", threshold)
  }

  /** The `kHashes` Bloom bit positions of a fingerprint column:
    * position i = first 8 hex chars of md5(fp + "#" + i), mod
    * `mBits`. Pure integer/md5 arithmetic both engines replay
    * bit-exactly (the [[md5Bucket]] discipline). */
  private def bloomPositions(fp: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map { i =>
      conv(substring(md5(concat(fp, lit(s"#$i"))), 1, 8), 16, 10)
        .cast("long") % mBits
    }

  /** Bloom-filter membership against a corpus — the bounded-memory
    * approximate-membership primitive (Bloom 1970; the paragraph/
    * document dedup backbone of Dolma's dedupe tooling, which keys a
    * Bloom filter by content hash — public). Where the streaming
    * dedup dictionaries cap hot buckets (an observable truncation,
    * see [[corpusBandCandidates]]), a Bloom filter holds EVERY
    * member in m bits with a tunable false-positive rate and zero
    * misses: `in_bloom` is always true for members; a non-member
    * reads true with p ≈ (1-e^(-kn/m))^k.
    *
    * Scale shape: the filter is DATA, not driver state — a
    * (word, bits) DataFrame of m/32 rows built by one `bit_or`
    * aggregation over the members' k bit positions (integer ops:
    * associative, commutative, partitioning-proof). Words are
    * 32-bit on purpose: the top half of each long stays clear so
    * the oracle engine's CHECKED BigInt shift can replay every mask
    * (1 << 63 overflows there; see [[bloomWord]]) — the price is 2×
    * storage (each long carries 32 payload bits). Probing is an
    * equi-join of the probes' k positions with that table on the
    * word index followed by a per-probe `bool_and` — no broadcast
    * required (though at typical m the table is broadcast-sized),
    * no collect, no per-task state beyond a join row. At 100 TB:
    * size m to the member count (m ≈ 9.6n bits at p≈1%, stored as
    * m/32 longs ≈ 2.4 GB per 10⁹ members under the 32-bit-word
    * encoding), and the word-keyed join stays shuffle-bounded
    * either way.
    *
    * The entry probes each document's exact fingerprint (id % 2 == 0)
    * or a perturbed one (id % 2 == 1, a guaranteed non-member), so
    * the output exposes both the no-miss guarantee and any false
    * positives: (doc_id, is_member, in_bloom). */
  /** 32-bit word index of a bit position: the shift below never
    * reaches the sign bit, so the oracle engine's checked BIGINT
    * shift can replay it (1 << 63 overflows there; Spark would wrap
    * silently — avoid both). */
  private def bloomWord(pos: Column): Column = shiftright(pos, 5)

  private def bloomMask(pos: Column): Column =
    call_function("shiftleft", lit(1L),
      pos.bitwiseAND(lit(31L)).cast("int"))

  /** The corpus Bloom bitset as DATA: a (word, bits) frame of
    * mBits/32 rows built by one `bit_or` aggregation over the member
    * fingerprints' k bit positions (integer ops — associative,
    * commutative, partitioning-proof). Persisted per (dir, m, k):
    * it is the static "index" side of ingest-time membership, the
    * same build-once contract as [[corpusLshTables]]. */
  private[graft] def corpusBloomBitset(spark: SparkSession, dir: String,
      mBits: Int = 1 << 14, kHashes: Int = 3): DataFrame = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    // stamp the build parameters onto the artifact: a probe with a
    // different modulus computes the wrong positions SILENTLY, so
    // [[bloomVsCorpus]] verifies these against its own arguments
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.bloom.mBits", mBits.toLong)
      .putLong("graft.bloom.kHashes", kHashes.toLong).build()
    persistOnce(s"bloom#$dir#$mBits#$kHashes") {
      spark.read.parquet(s"$dir/documents.parquet")
        .select(md5(col("text")).as("fp"))
        .select(explode(array(bloomPositions(col("fp"), mBits, kHashes): _*)).as("pos"))
        .select(bloomWord(col("pos")).as("word"), bloomMask(col("pos")).as("mask"))
        .groupBy("word")
        .agg(call_function("bit_or", col("mask")).as("bits", meta))
    }
  }

  /** Require that an artifact frame's stamped build parameters match
    * the probe's arguments — catches the silent-wrong-answer case
    * where a bitset/sketch built at one (m, k)/(w, d) is probed with
    * another (the positions are modular hashes: a different modulus
    * yields valid-looking garbage, not an error). Lenient when the
    * stamp is absent (hand-built frames in specs). */
  private[pipeline] def requireArtifactParams(frame: DataFrame,
      colName: String, expected: Seq[(String, Long)], what: String): Unit = {
    val md = frame.schema(colName).metadata
    expected.foreach { case (key, v) =>
      if (md.contains(key))
        require(md.getLong(key) == v,
          s"$what was built with $key=${md.getLong(key)} but is being " +
            s"probed with $key=$v — positions would be computed with the " +
            "wrong modulus; rebuild the artifact or pass matching parameters")
    }
  }

  /** The standard probe frame: even ids ask for their own fingerprint
    * (member), odd ids for a perturbed one (guaranteed non-member) —
    * so the no-miss guarantee AND the false-positive rate are both
    * observable in the output. Shared by the batch entry and the
    * streaming form (same rows → same oracle). */
  private[graft] def bloomProbeFrame(d: DataFrame): DataFrame =
    d.select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("is_member", col("doc_id") % 2 === 0)
      .withColumn("probe_fp",
        when(col("is_member"), col("fp"))
          .otherwise(md5(concat(col("fp"), lit("!absent")))))
      .select(col("doc_id"), col("is_member"), col("probe_fp"))

  def bloomMembership(spark: SparkSession, dir: String,
      mBits: Int = 1 << 14, kHashes: Int = 3): DataFrame = {
    val bitset = corpusBloomBitset(spark, dir, mBits, kHashes)
    val probes = bloomProbeFrame(
        spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("is_member"),
        posexplode(array(bloomPositions(col("probe_fp"), mBits, kHashes): _*))
          .as(Seq("i", "pos")))
      .select(col("doc_id"), col("is_member"),
        bloomWord(col("pos")).as("word"), bloomMask(col("pos")).as("mask"))
    probes.join(bitset, Seq("word"), "left")
      .groupBy("doc_id", "is_member")
      .agg(call_function("bool_and",
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L))
        .as("in_bloom"))
      .select(col("doc_id"), col("is_member"), col("in_bloom"))
      .orderBy("doc_id")
  }

  /** The streaming form of [[bloomMembership]]'s probe: each arriving
    * document checks its k bits with k STREAM-STATIC LEFT JOINS
    * against the (word, bits) bitset — the k positions stay COLUMNS
    * (no explode), the verdict is an in-row conjunction, and the plan
    * carries no aggregation, so the query is completely STATELESS
    * (the e2e-ingest-DAG join discipline). This is the uncapped
    * answer to the capped per-bucket candidate dictionaries
    * ([[corpusBandCandidates]]'s observable truncation): a Bloom
    * bitset holds EVERY member in fixed memory — exact misses, FP-only
    * divergence, no hot-bucket cap to silently cross at scale. */
  private[graft] def bloomVsCorpus(docs: DataFrame, bitset: DataFrame,
      mBits: Int = 1 << 14, kHashes: Int = 3): DataFrame = {
    requireArtifactParams(bitset, "bits",
      Seq("graft.bloom.mBits" -> mBits.toLong,
        "graft.bloom.kHashes" -> kHashes.toLong), "Bloom bitset")
    val base = bloomProbeFrame(docs)
    val withBits = (0 until kHashes).foldLeft(
      (0 until kHashes).foldLeft(base) { (d, i) =>
        val pos = bloomPositions(col("probe_fp"), mBits, kHashes)(i)
        d.withColumn(s"w$i", bloomWord(pos)).withColumn(s"m$i", bloomMask(pos))
      }) { (d, i) =>
      // explicit broadcast: a streaming query gets no AQE, so the
      // planner would fall back to size estimates of the bitset's
      // parquet lineage and could shuffle the DOC STREAM into a
      // sort-merge join per micro-batch; the filter is mBits/32 rows
      // by construction — broadcast-sized at any m a deployment
      // would pick for one broadcastable filter
      d.join(broadcast(bitset.select(col("word").as(s"w$i"), col("bits").as(s"b$i"))),
        Seq(s"w$i"), "left")
    }
    val inBloom = (0 until kHashes)
      .map(i => coalesce(col(s"b$i"), lit(0L)).bitwiseAND(col(s"m$i")) =!= 0L)
      .reduceLeft(_ && _)
    withBits.select(col("doc_id"), col("is_member"), inBloom.as("in_bloom"))
  }
}
