package graft.pipeline

import graft.analysis.Analyzers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure Column
  * pipelines (codegen-friendly, one scan each, no shuffles except the
  * final deterministic orderBy for the harness).
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword-
    * overlap language heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "zu", "den", "von"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "del"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "est"),
    "it" -> Seq("il", "lo", "di", "che", "e", "un", "una", "per", "con", "del"))

  private def toks(c: Column): Column = Analyzers.default.tokensCol(c)

  /** Occurrences of `words` members in a token array — the native
    * codegen [[graft.functions.ArrayCountIn]]; the equivalent
    * `size(filter(tokens, isInCollection(words)))` HOF evaluates
    * interpreted per element and dominated the langId/quality scans.
    * Caller must have run SearchExpressions.register. */
  private def countIn(tokens: Column, words: Seq[String]): Column =
    call_function("array_count_in", tokens, array(words.map(lit): _*))

  /** All [[LangProfiles]] stopword counts in ONE token pass: a
    * `multi_count_in` call returning one count per profile (hash
    * lookup per token instead of one scan per profile). Requires
    * [[graft.functions.SearchExpressions.register]] on the session. */
  private[graft] def langCountsExpr(tokens: Column): Column =
    call_function("multi_count_in", tokens,
      array(LangProfiles.map { case (_, ws) => array(ws.map(lit): _*) }: _*))

  /** First-match-wins language pick from a [[langCountsExpr]] result:
    * ties resolve to [[LangProfiles]] order (de < en < es < fr < it)
    * via a >= comparison chain — the same CASE chain the oracles
    * use. Shared by the batch [[langId]] and the streaming ingest
    * curation gate so the two can never drift. */
  private[graft] def langPredFromCounts(mc: Column): Column = {
    val langs = LangProfiles.map(_._1)
    def s(i: Int) = element_at(mc, i + 1)
    langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), rest) =>
        val geAll = langs.indices.filter(langs(_) != l)
          .map(j => s(i) >= s(j)).reduceLeft(_ && _)
        when(geAll, lit(l)).otherwise(rest)
    }
  }

  /** Stopword-overlap language ID. Ties resolve to the first language
    * in [[LangProfiles]] order (de < en < es < fr < it) via a
    * first-match-wins >= comparison chain — the same CASE chain the
    * oracle uses. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang").as("actual_lang"), toks(col("text")).as("tokens"))
      // all 5 profiles in ONE token pass (hash lookup per token)
      // instead of 5 array_count_in probes scanning their word lists
      .withColumn("__mc", langCountsExpr(col("tokens")))
    val scored = LangProfiles.zipWithIndex.foldLeft(base) {
      case (df, ((l, _), i)) =>
        df.withColumn(s"s_$l", element_at(col("__mc"), i + 1))
    }
    val langs = LangProfiles.map(_._1)
    val pred = langPredFromCounts(col("__mc"))
    scored.select(
        col("doc_id") +: col("actual_lang") +: lit(pred).as("pred_lang") +:
          langs.map(l => col(s"s_$l")): _*)
      .orderBy("doc_id")
  }

  /** Distinctive character trigrams per language (with their leading/
    * trailing spaces as word-boundary markers) for the n-gram
    * language heuristic. */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("er ", "der", " de", "ie ", "ein", "sch", "ich", "nde", "die", "und"),
    "en" -> Seq("he ", "the", " th", "ing", "ng ", "and", " an", "ed ", " of", "ion"),
    "es" -> Seq("de ", " de", "os ", "la ", " la", "ado", "cio", "es ", "ent", "que"),
    "fr" -> Seq("es ", " de", "de ", "le ", " le", "ent", "et ", "que", "ion", "eur"),
    "it" -> Seq("re ", "to ", " di", "di ", "la ", "che", "ion", "zio", "ell", "per"))

  /** n-gram (character trigram) language ID — the classic Cavnar/
    * Trenkle-style profile-overlap heuristic, next to the stopword
    * profile of [[langId]]: score per language = occurrences of its
    * distinctive trigrams in the text; ties resolve to profile order.
    * Pure Column arithmetic (one regexp-free scan per profile
    * trigram), SQL-replicable for the oracle. */
  def langIdNgram(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang").as("actual_lang"), col("text"))
      // one pass over the text for all 50 (language, trigram) pairs —
      // the length(replace(...)) formulation scanned the text once per
      // pair; multi_substr_count replicates its greedy non-overlapping
      // occurrence counting byte-exactly
      .withColumn("__msc", call_function("multi_substr_count", lower(col("text")),
        array(TrigramProfiles.map { case (_, gs) => array(gs.map(lit): _*) }: _*)))
    val scored = TrigramProfiles.zipWithIndex.foldLeft(base) {
      case (df, ((l, _), i)) =>
        df.withColumn(s"s_$l", element_at(col("__msc"), i + 1))
    }
    val langs = TrigramProfiles.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduceLeft(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    scored.select(
        col("doc_id") +: col("actual_lang") +: pred.as("pred_lang") +:
          langs.map(l => col(s"s_$l")): _*)
      .orderBy("doc_id")
  }

  /** Heuristic document quality score in [0, 1]:
    * length saturation x (1 - stopword ratio) x type-token ratio. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val en = LangProfiles.toMap.apply("en")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), toks(col("text")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("n_distinct", size(array_distinct(col("tokens"))))
      .withColumn("n_stop", countIn(col("tokens"), en))
      .withColumn("avg_token_len",
        graft.functions.Rounding.roundEven(call_function("array_total_strlen", col("tokens")).cast("double") /
          greatest(col("n_tokens"), lit(1)), 4))
      .withColumn("ttr",
        graft.functions.Rounding.roundEven(col("n_distinct").cast("double") / greatest(col("n_tokens"), lit(1)), 4))
      .withColumn("stop_ratio",
        graft.functions.Rounding.roundEven(col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)), 4))
      .withColumn("quality",
        graft.functions.Rounding.roundEven(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - col("stop_ratio")) * col("ttr"), 4))
      .select("doc_id", "n_tokens", "n_distinct", "avg_token_len", "ttr",
        "stop_ratio", "quality")
      .orderBy("doc_id")
  }

  /** Contiguous n-grams WITH multiplicity (unlike [[Dedup.shingles]],
    * which dedups for set-Jaccard) — repetition measurement needs the
    * duplicates. */
  private def ngramsAll(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", app. A1.1 repetition filters — public):
    *
    *  - `dup_line_frac`: repeated line slots / total lines
    *    (newline-split; single-line docs score 0);
    *  - `top_2gram_frac`: characters covered by the most frequent
    *    2-gram (count x gram length, joining space included) over the
    *    document's character length;
    *  - `dup_5gram_frac`: characters covered by 5-grams occurring
    *    more than once, over the character length (overlapping grams
    *    each count — the ratio can exceed 1 for degenerate loops,
    *    which is exactly the signal).
    *
    * These are DOC-LOCAL statistics, so the whole computation runs
    * in-row through the native [[graft.functions.RepetitionStats]]
    * expression — one scan, no shuffle except the harness orderBy.
    * The previous explode + (doc_id, gram) groupBy shape shuffled the
    * corpus's entire gram stream for values each row determines by
    * itself. Ties for the top gram break on (count, length, gram)
    * descending so both engines pick the same winner. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    val lines = split(col("text"), "\n")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        length(col("text")).cast("double").as("n_chars"),
        size(lines).cast("long").as("n_lines"),
        graft.functions.Rounding.roundEven(
          (size(lines) - size(array_distinct(lines))).cast("double") /
            size(lines), 4).as("dup_line_frac"),
        call_function("repetition_stats", toks(col("text"))).as("rs"))
      .select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
        graft.functions.Rounding.roundEven(col("rs.top2_chars") / col("n_chars"), 4)
          .as("top_2gram_frac"),
        graft.functions.Rounding.roundEven(col("rs.dup5_chars") / col("n_chars"), 4)
          .as("dup_5gram_frac"))
      .orderBy("doc_id")
  }

  /** Shuffle-based repetition signals — kept as the differential-
    * testing reference for [[repetitionSignals]]' native expression. */
  private[pipeline] def repetitionSignalsViaShuffle(
      spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), toks(col("text")).as("tokens"))
    val lines = split(col("text"), "\n")
    val base = d.select(
      col("doc_id"),
      length(col("text")).cast("double").as("n_chars"),
      size(lines).cast("long").as("n_lines"),
      graft.functions.Rounding.roundEven((size(lines) - size(array_distinct(lines))).cast("double") /
        size(lines), 4).as("dup_line_frac"))
    def gramCounts(n: Int) = d
      .select(col("doc_id"), explode(ngramsAll(col("tokens"), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val top2 = gramCounts(2)
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("c").desc, length(col("g")).desc, col("g").desc)))
      .where(col("rn") === 1)
      .select(col("doc_id"), (col("c") * length(col("g"))).cast("double").as("top2_chars"))
    val dup5 = gramCounts(5)
      .groupBy("doc_id")
      .agg(sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L))
        .cast("double").as("dup5_chars"))
    base.join(top2, Seq("doc_id"), "left").join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
        graft.functions.Rounding.roundEven(coalesce(col("top2_chars"), lit(0.0)) / col("n_chars"), 4)
          .as("top_2gram_frac"),
        graft.functions.Rounding.roundEven(coalesce(col("dup5_chars"), lit(0.0)) / col("n_chars"), 4)
          .as("dup_5gram_frac"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other non-space chars). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).as("bpe_ish_tokens"),
        length(col("text")).as("n_chars_utf8"))
      .orderBy("doc_id")

  /** Corpus-wide adjacent-token-pair statistics — the counting step of
    * a BPE merge-mining iteration (Sennrich et al. 2016): every
    * adjacent pair with its total occurrence count and document
    * frequency, top-`topK` by count. A tokenizer-training pipeline
    * runs this, merges the argmax pair, and repeats; the expensive
    * distributed part is exactly this count, and its scale shape is
    * one corpus-token-sized explode into a partial-aggregated
    * (pair)-keyed count — linear, map-side-combined, no skew beyond
    * natural Zipf (absorbed by the partial agg), top-K bounded via
    * TakeOrdered (never a global sort). `tokens` is projected as a
    * materialized attribute BEFORE the pair lambda so element_at
    * references stay cheap (see [[graft.functions.ShingleStrings]]). */
  def tokenPairStats(spark: SparkSession, dir: String, topK: Int = 30): DataFrame = {
    val pairs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), toks(col("text")).as("tokens"))
      .select(col("doc_id"),
        // guard: sequence(1, n-1) DESCENDS for n < 2 — emit no pairs
        explode(when(size(col("tokens")) >= 2,
          transform(sequence(lit(1), size(col("tokens")) - 1),
            i => concat_ws(" ", element_at(col("tokens"), i),
              element_at(col("tokens"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair")
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(topK)
  }

  /** The [[qualityScore]] scalar as one Column over a token array —
    * shared with [[Curation.selectBudget]] so selection ranks by the
    * exact same (4-dp-rounded) quality the scoring entry reports. */
  private[graft] def qualityExpr(tokens: Column): Column = {
    import graft.functions.Rounding.roundEven
    val n = size(tokens)
    val ttr = roundEven(size(array_distinct(tokens)).cast("double") /
      greatest(n, lit(1)), 4)
    val stopRatio = roundEven(
      countIn(tokens, LangProfiles.toMap.apply("en")).cast("double") /
        greatest(n, lit(1)), 4)
    roundEven(least(n.cast("double") / 100.0, lit(1.0)) *
      (lit(1.0) - stopRatio) * ttr, 4)
  }

  /** Distinct-token cardinality per language, exact AND by Datasketches
    * HyperLogLog (`hll_sketch_agg`, lgConfigK=12 → ~1.6% relative
    * standard error). The sketch is THE 100 TB shape for distinct
    * counts: fixed 2^12-register state per group, map-side partial
    * sketches merged register-wise (order-insensitive), no shuffle of
    * the distinct value set — where exact `count(DISTINCT)` must
    * shuffle every distinct token. The entry materializes the
    * accuracy CONTRACT (estimate within 5% ≈ 3σ of exact) per group;
    * the raw estimate differs across engines by construction, the
    * boolean does not. */
  def distinctTokensHll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(toks(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(
        count_distinct(col("term")).as("n_exact"),
        expr("hll_sketch_estimate(hll_sketch_agg(term, 12))").as("n_est"))
      .select(col("lang"), col("n_exact"),
        (abs(col("n_est").cast("double") / col("n_exact") - 1.0) <= 0.05).as("hll_ok"))
      .orderBy("lang")

  /** Per-language heavy-hitter terms via the Datasketches
    * frequent-items sketch (`approx_top_k`, ItemsSketch under the
    * hood) — the bounded-state counterpart to an exact per-term
    * count: each task tracks at most maxItemsTracked counters per
    * group and partials merge counter-wise, so at 100 TB the
    * aggregation state per (group, partition) is KBs where the exact
    * count must shuffle the full vocabulary. The sketch is exact
    * whenever a group's distinct items fit the tracked capacity
    * (synthetic vocab here: 31 items << 64 tracked); its returned
    * order on count ties is sketch-internal, so the top-k cut is
    * re-ranked deterministically (count desc, term asc) AFTER the
    * sketch — the retrieval depth (40) exceeds the vocabulary, making
    * the emitted top-k exactly the true top-k. */
  def topTermsSketch(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(toks(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(expr("approx_top_k(term, 40, 64)").as("tk"))
      .select(col("lang"), explode(col("tk")).as("e"))
      .select(col("lang"), col("e.item").as("term"), col("e.count").as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("n").desc, col("term").asc)))
      .where(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"), col("term"), col("n"))
      .orderBy("lang", "rank")
  }

  /** Count-Min sketch term-frequency estimation (Cormode &
    * Muthukrishnan 2005) — the frequency sibling of the Bloom filter
    * ([[Dedup.bloomMembership]]) and the last member of the bounded
    * sketch family (HLL distincts, frequent-items top-k, Bloom
    * membership, CMS frequencies): collection frequencies for an
    * UNBOUNDED vocabulary in d·w counters, one-sided error
    * (estimate >= truth, always).
    *
    * Scale shape: the sketch is DATA — a (row, idx, cnt) frame of at
    * most d·w rows from ONE aggregation over the exploded token
    * stream (counts: associative integers, partitioning-proof).
    * Estimation is a (row, idx)-keyed equi-join of the probe terms'
    * d hash cells with that frame and a `min` fold per term; the
    * sketch broadcasts at any practical (d, w). Merging shards =
    * summing counters cell-wise — the property that makes CMS the
    * standard distributed frequency sketch.
    *
    * The entry probes EVERY corpus term (truth joined alongside) plus
    * `nAbsent` synthetic absent terms, so the one-sided guarantee and
    * the collision overestimates are both hash-visible. All-integer
    * md5 arithmetic — the oracle replays the sketch cell-exactly.
    * Output: (term, cf, est, exact) with est >= cf by construction. */
  /** CMS cell index of a term for hash row i (md5 prefix mod w — the
    * [[graft.pipeline.Dedup]] md5Bucket discipline, oracle-exact). */
  private[graft] def cmsCell(term: Column, i: Int, w: Int): Column =
    conv(substring(md5(concat(term, lit(s"@$i"))), 1, 8), 16, 10)
      .cast("long") % w

  /** The corpus CMS sketch as DATA: (row, idx, cnt), ≤ d·w rows from
    * one aggregation over the exploded token stream. Shared by the
    * batch estimator and the streaming frequency service. */
  private[graft] def cmsSketch(spark: SparkSession, dir: String,
      w: Int, d: Int): DataFrame = {
    // stamp (w, d) onto the artifact — a probe with a different
    // width hashes into the wrong cells silently, so
    // [[cmsEstimateStream]] verifies the stamp against its arguments
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.cms.w", w.toLong)
      .putLong("graft.cms.d", d.toLong).build()
    spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(toks(col("text"))).as("term"))
      .select(posexplode(array((0 until d).map(i => cmsCell(col("term"), i, w)): _*))
        .as(Seq("row", "idx")))
      .groupBy("row", "idx").agg(count(lit(1)).as("cnt", meta))
  }

  def cmsTermCounts(spark: SparkSession, dir: String, w: Int = 1024,
      d: Int = 3, nAbsent: Int = 5): DataFrame = {
    def cell(term: Column, i: Int): Column = cmsCell(term, i, w)
    val terms = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(toks(col("text"))).as("term"))
    val truth = terms.groupBy("term").agg(count(lit(1)).as("cf"))
    val sketch = cmsSketch(spark, dir, w, d)
    val absent = spark.range(nAbsent.toLong)
      .select(concat(lit("absent_probe_"), col("id").cast("string")).as("term"),
        lit(0L).as("cf"))
    val probes = truth.unionByName(absent)
      .select(col("term"), col("cf"),
        posexplode(array((0 until d).map(i => cell(col("term"), i)): _*))
          .as(Seq("row", "idx")))
    probes.join(sketch, Seq("row", "idx"), "left")
      .groupBy("term", "cf")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("term"), col("cf"), col("est"),
        (col("est") === col("cf")).as("exact"))
      .orderBy("term")
  }

  /** The CMS as a streaming-side frequency service: each arriving
    * document's DISTINCT terms are annotated with their corpus
    * collection-frequency estimate — the ingest-time rarity/novelty
    * signal (rare-term ratios feed quality gates and OOD detection)
    * without touching the corpus at query time. Stateless by
    * construction: explode to (doc, term) grain, compute the d cell
    * indices as columns, and resolve each against ITS row-slice of
    * the sketch with one stream-static broadcast LEFT join (no
    * re-aggregation — the min over d estimates is an in-row `least`),
    * so the plan carries no state store and the only corpus-sized
    * work happened at sketch build. One-sided error carries over:
    * est >= true cf, always. Output: (doc_id, term, est). */
  def cmsEstimateStream(docs: DataFrame, sketch: DataFrame,
      w: Int = 1024, d: Int = 3): DataFrame = {
    graft.pipeline.Dedup.requireArtifactParams(sketch, "cnt",
      Seq("graft.cms.w" -> w.toLong, "graft.cms.d" -> d.toLong),
      "CMS sketch")
    val base = docs.select(col("doc_id"),
      explode(array_distinct(toks(col("text")))).as("term"))
    val withCells = (0 until d).foldLeft(
      (0 until d).foldLeft(base) { (df, i) =>
        df.withColumn(s"c$i", cmsCell(col("term"), i, w))
      }) { (df, i) =>
      // broadcast each row-slice explicitly: streaming plans get no
      // AQE (the bloomVsCorpus discipline)
      df.join(broadcast(sketch.where(col("row") === i)
          .select(col("idx").as(s"c$i"), col("cnt").as(s"n$i"))),
        Seq(s"c$i"), "left")
    }
    val est = (0 until d).map(i => coalesce(col(s"n$i"), lit(0L)))
      .reduceLeft(least(_, _))
    withCells.select(col("doc_id"), col("term"), est.as("est"))
  }

  /** Document fingerprints: full-content md5, winnowing-style minimum
    * 5-shingle md5 (content-shift tolerant, via the native
    * [[graft.functions.MinShingleMd5]] — the Column form
    * `array_min(transform(shingles, md5))` evaluates interpreted),
    * and bag-of-words md5. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), toks(col("text")).as("tokens"))
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_full"),
        coalesce(
          call_function("min_shingle_md5", col("tokens"), lit(5)),
          md5(col("text"))).as("fp_min_shingle"),
        md5(concat_ws(" ", array_sort(array_distinct(col("tokens"))))).as("fp_bow"))
      .orderBy("doc_id")
  }

  /** Column-pipeline fingerprints — differential-testing reference
    * for [[fingerprints]]' native min-shingle expression. */
  private[pipeline] def fingerprintsViaColumns(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), toks(col("text")).as("tokens"))
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_full"),
        coalesce(
          array_min(transform(Dedup.shingles(col("tokens"), 5), s => md5(s))),
          md5(col("text"))).as("fp_min_shingle"),
        md5(concat_ws(" ", array_sort(array_distinct(col("tokens"))))).as("fp_bow"))
      .orderBy("doc_id")

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * positional n-token shingles → 60-bit md5 hash each → minimum of
    * every w-hash sliding window → the distinct selected hashes are
    * the document's fingerprint set. Guarantees any shared run of
    * n + w - 1 tokens contributes at least one common selected hash,
    * so partial overlap is detectable from the (much smaller)
    * fingerprint sets alone.
    *
    * Output per doc: selection count + md5 digest of the sorted
    * selection (all integer/string ops — hash-exact across engines).
    * One scan, no shuffle except the harness orderBy; the whole
    * selection runs in the native [[graft.functions.WinnowFingerprint]]
    * expression (the three nested `transform` HOFs of
    * [[winnowingViaColumns]] evaluate interpreted — measured ~3x
    * slower at sf0.1 — and the deque is O(len) vs O(len*w)). */
  def winnowing(spark: SparkSession, dir: String, n: Int = 5, w: Int = 4): DataFrame = {
    graft.functions.SearchExpressions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        call_function("winnow_fingerprint", toks(col("text")), lit(n), lit(w)).as("wf"))
      .select(col("doc_id"),
        col("wf.n_selected").as("n_selected"), col("wf.fp_winnow").as("fp_winnow"))
      .orderBy("doc_id")
  }

  /** Column-pipeline winnowing — kept as the differential-testing
    * reference for [[winnowing]]'s native expression. */
  private[pipeline] def winnowingViaColumns(
      spark: SparkSession, dir: String, n: Int = 5, w: Int = 4): DataFrame = {
    val tokens = toks(col("text"))
    // positional shingles (winnowing needs the sequence, so no
    // array_distinct here, unlike Dedup.shingles)
    val shingles = when(size(col("tokens")) >= n,
      transform(sequence(lit(1), size(col("tokens")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(col("tokens"), i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    val hashes = transform(col("shingles"), s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    // guard: sequence(1, len-w+1) descends when len < w (yielding
    // [1, 0]); short docs select every shingle hash instead
    val mins = when(size(col("hs")) >= w,
      transform(sequence(lit(1), size(col("hs")) - (w - 1)),
        i => array_min(slice(col("hs"), i, lit(w)))))
      .otherwise(col("hs"))
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), tokens.as("tokens"))
      .withColumn("shingles", shingles)
      .withColumn("hs", hashes)
      .withColumn("sel", array_sort(array_distinct(mins)))
      .select(col("doc_id"),
        size(col("sel")).as("n_selected"),
        md5(concat_ws(",", transform(col("sel"), h => h.cast("string")))).as("fp_winnow"))
      .orderBy("doc_id")
  }

}
