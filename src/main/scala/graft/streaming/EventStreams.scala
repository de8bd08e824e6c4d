package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Structured Streaming operators over the `events` stream (SURVEY
  * §2.7 — the reference is batch-only; this is the north-star
  * streaming surface built on watermarks + windows + typed state).
  *
  * Every transform here takes a DataFrame that may be batch or
  * streaming (`spark.readStream` vs `spark.read`): the same logical
  * plan serves both, which is how the batch entries in SparkEntry are
  * oracle-checked while the streaming path is exercised in tests with
  * MemoryStream.
  *
  * Scale: windowed aggregations are partial-aggregated per window key;
  * watermarks bound state; sessionization uses `session_window` (state
  * bounded by watermark + gap); incremental per-key stats use
  * mapGroupsWithState with explicit timeouts.
  */
object EventStreams {

  /** Value sums accumulate as DECIMAL(30,8) — exact, so the result is
    * independent of micro-batch boundaries and partitioning, and
    * matches the decimal-exact batch/oracle sums (see
    * RelationalQueries.decSum: a double sum's order-dependent last
    * ulp can straddle a rounding boundary). */
  private def decValue = col("value").cast(DecimalType(30, 8))

  /** Tumbling 1-hour windows with a 10-minute watermark: event counts
    * and value sums per (window, event_type). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(decValue).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows: 1 hour long, advancing every 15 minutes. The
    * mean is an exact decimal sum divided as double, so both engines
    * divide identical inputs (RelationalQueries.decAvg pattern). */
  def slidingAvg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(sum(decValue).as("sv"), count(col("value")).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"),
        (col("sv").cast("double") / col("n")).as("avg_value"))

  /** Session windows with a 30-minute gap per user. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(decValue).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: the events stream against a
    * broadcast dimension (customer segment), then a per-(segment,
    * event_type) aggregate. The static side is read once and
    * broadcast to every micro-batch — the standard pattern for
    * dimension lookup in a pipeline ingesting 100 TB/day; no stream
    * state beyond the aggregation itself. */
  def enrichWithSegments(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(
        customers.select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"))), Seq("user_id"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(decValue).as("sum_value"))

  /** Stream-stream interval join: each click matched to the same
    * user's purchases within `horizon` AFTER it. Both sides carry
    * watermarks and the join condition bounds event time on both
    * ends, so Spark can expire join state — the property that keeps a
    * stream-stream join runnable forever (an unbounded-time join
    * would accumulate every row). Inner join: matches emit as soon as
    * both sides arrive. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)
  /** Internal accumulator: the value total as a scaled long
    * (units of 1e-8) so state addition is exact and
    * arrival-order-independent — the typed-state counterpart of the
    * DECIMAL(30,8) sums in the windowed aggregations above.
    * (`private` would hide the constructor from the state encoder's
    * generated code.) */
  private[streaming] final case class UserStatsAcc(n_events: Long, total_scaled: Long)

  /** Incremental per-user running stats via typed state — the
    * KeyValueGroupedDataset.mapGroupsWithState path for custom
    * stateful logic (e.g. incremental index maintenance). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStatsAcc, UserStats](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserStatsAcc]) =>
          val prev = state.getOption.getOrElse(UserStatsAcc(0L, 0L))
          var n = prev.n_events
          var total = prev.total_scaled
          // quantize per event to 8 decimals exactly as the oracle's
          // CAST(value AS DECIMAL(18,8)) does: BigDecimal from the
          // double's shortest decimal representation, HALF_UP at
          // scale 8. math.round(e.value * 1e8) would round the
          // *binary product* half-up-toward-+inf (round(-0.5)=0),
          // desyncing negative half-points; long addition stays exact
          rows.foreach { e =>
            n += 1
            total += BigDecimal(e.value)
              .setScale(8, BigDecimal.RoundingMode.HALF_UP)
              .underlying().unscaledValue().longValueExact()
          }
          state.update(UserStatsAcc(n, total))
          UserStats(userId, n, total / 1e8)
      }
  }

  final case class FunnelEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp, event_id: Long)
  /** Stage machine state: 0 = nothing, 1 = seen stage-1, 2 = seen
    * stage-2 after stage-1, 3 = completed (terminal). Times in epoch
    * micros. */
  private[streaming] final case class FunnelState(stage: Int, t1: Long, t2: Long)
  final case class FunnelCompletion(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Streaming funnel detection — the online twin of the batch
    * q28_funnel: a per-user stage machine over arriving events emits
    * one completion row the moment the user finishes
    * stage1 -> stage2 -> stage3 with each stage STRICTLY after the
    * previous (greedy-first matching on the event-time order, which
    * equals the batch min-time formulation). State per user is three
    * numbers — bounded forever regardless of event volume, the
    * property that lets conversion tracking run continuously.
    *
    * Events are event-time-sorted WITHIN each micro-batch (ties by
    * event_id); cross-batch correctness needs batches time-ordered
    * per user, which the bounded single-file replay satisfies — a
    * production deployment feeds this from a per-key-ordered log
    * (Kafka partitions by user) exactly as it would any sequence
    * detector. */
  def funnelStream(events: Dataset[FunnelEvent],
      stages: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelCompletion] = {
    import events.sparkSession.implicits._
    require(stages.size == 3, "funnelStream models a three-stage funnel")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelCompletion]
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            if (st.stage == 0 && e.event_type == stages(0))
              st = FunnelState(1, us, 0L)
            else if (st.stage == 1 && e.event_type == stages(1) && us > st.t1)
              st = FunnelState(2, st.t1, us)
            else if (st.stage == 2 && e.event_type == stages(2) && us > st.t2) {
              out += FunnelCompletion(userId, st.t1, st.t2, us)
              st = FunnelState(3, st.t1, st.t2)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Incremental index maintenance: term statistics (cf = total term
    * frequency, df = doc frequency) maintained as streaming state over
    * a document stream — the streaming counterpart of
    * [[graft.search.SearchIndex]]'s build-time stats pass (SURVEY §7
    * Phase 4). Run in Complete/Update mode the state IS the live
    * term-stats table; the batch and streaming plans are identical.
    *
    * State is bounded by vocabulary size (not corpus size): partial
    * aggregation per micro-batch, merged into the state store. */
  def incrementalTermStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    docs
      .select(toks.as("tokens"))
      .select(explode(col("tokens")).as("term"),
        size(col("tokens")).as("dl"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cf"))
  }

  /** Streaming doc-frequency stats (distinct terms per doc). */
  def incrementalDocFreq(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    docs
      .select(explode(array_distinct(toks)).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
  }

  final case class ScoredItem(user_id: Long, item: Long, score: Double)
  /** `n_seen` counts every input row merged so far — monotone across
    * micro-batches, so an Update-mode sink's final state per user is
    * its max-`n_seen` row (the same batch-count defense
    * runningUserStats gets from its monotone `n_events`). */
  final case class UserTopK(user_id: Long, items: Seq[Long], scores: Seq[Double],
      n_seen: Long)

  /** Bounded per-key top-k as a `transformWithState` StatefulProcessor
    * (the arbitrary-state API that supersedes mapGroupsWithState in
    * Spark 4; requires the RocksDB state store): state per user is the
    * O(k) list of best (item, score) pairs — the streaming face of
    * [[graft.functions.TopKAgg]], same ordering contract (score desc,
    * key asc). A re-scored item keeps its BEST score (one slot per
    * item — a rescore must not occupy two ranks). TTL bounds state
    * lifetime for keys that go quiet; it requires processing-time
    * mode, which [[runningTopKPerUser]] selects automatically. */
  class TopKProcessor(k: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, ScoredItem, UserTopK] {
    @transient private var state: ValueState[(List[(Long, Double)], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(List[(Long, Double)], Long)](
        "topk", ExpressionEncoder[(List[(Long, Double)], Long)](), ttl)

    override def handleInputRows(key: Long, rows: Iterator[ScoredItem],
        timerValues: TimerValues): Iterator[UserTopK] = {
      val (cur, seen) = if (state.exists()) state.get() else (Nil, 0L)
      var nIn = 0L
      val merged = (cur ++ rows.map { r => nIn += 1; r.item -> r.score })
        .groupMapReduce(_._1)(_._2)(math.max)
        .toList
        .sortBy(t => (-t._2, t._1)).take(k)
      state.update((merged, seen + nIn))
      Iterator.single(UserTopK(key, merged.map(_._1), merged.map(_._2), seen + nIn))
    }
  }

  /** Running per-user top-k over a scored item stream. Pass a TTL to
    * expire idle users' state (switches to processing-time mode, the
    * mode state TTL requires). */
  def runningTopKPerUser(events: Dataset[ScoredItem], k: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTopK] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new TopKProcessor(k, ttl), timeMode, OutputMode.Update())
  }

  /** Trending terms: windowed term counts over a document stream —
    * the streaming face of `getTermCounts`. Watermark bounds window
    * state; counts are partial-aggregated per (window, term). Rank
    * the closed windows at the sink (`row_number` per window) for the
    * top-k view: top-k inside a streaming agg would need complete
    * mode, which is unbounded — ranking closed windows is the
    * scale-safe shape. */
  def trendingTerms(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(toks).as("term"))
      .groupBy(window(col(tsCol), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("term"), col("n"))
  }

  /** Streaming exact deduplication of a document stream: key on the
    * content hash, keep the first arrival, drop later copies. State is
    * BOUNDED by the watermark — `dropDuplicatesWithinWatermark` evicts
    * hashes older than the event-time horizon, so state size tracks
    * the dedup window, not the stream history (the property that
    * makes continuous ingest dedup viable at 100 TB/day; an unbounded
    * `dropDuplicates` would grow state forever).
    *
    * Near-dup streaming variant: compute a simhash/minhash-band column
    * the same way and dedup on it — same state bound. */
  def dedupStream(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Ingest-time curation gate — the per-document quality pipeline a
    * training-data ingest runs CONTINUOUSLY as documents arrive:
    * tokenize, language-ID (stopword profiles, one `multi_count_in`
    * pass), Gopher-style quality score, PII span count — then keep
    * only documents clearing the length and quality gates.
    *
    * Entirely STATELESS: every signal is doc-local, so the micro-batch
    * plan has no stateful operator, no watermark requirement and no
    * state store — the shape that runs at ingest line-rate forever
    * (100 TB/day is just more map tasks). The expressions are shared
    * with the batch operators ([[graft.pipeline.TextAnalysis.langPredFromCounts]],
    * [[graft.pipeline.TextAnalysis.qualityExpr]],
    * [[graft.pipeline.Curation.PiiPatterns]]) so batch and streaming
    * curation can never disagree on a document. */
  def curateStream(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 16, minQuality: Double = 0.05): DataFrame = {
    graft.functions.SearchExpressions.register(docs.sparkSession)
    import graft.pipeline.{Curation, TextAnalysis}
    val nPii = Curation.PiiPatterns
      .map { case (_, re, _) => regexp_count(col(textCol), lit(re)) }
      .reduceLeft(_ + _)
    docs
      .withColumn("__toks", graft.analysis.Analyzers.default.tokensCol(col(textCol)))
      .select(col("doc_id"),
        TextAnalysis.langPredFromCounts(
          TextAnalysis.langCountsExpr(col("__toks"))).as("pred_lang"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.qualityExpr(col("__toks")).as("quality"),
        nPii.cast("long").as("n_pii"))
      .where(col("n_tokens") >= minTokens && col("quality") >= minQuality)
  }

  /** Streaming NEAR-duplicate pair detection — continuous-ingest
    * SimHash: every arriving document's 64-bit fingerprint is
    * computed MAP-SIDE by the codegen'd `simhash64` expression (a
    * fingerprint is doc-local state, so the stream side stays
    * stateless), exploded into 4 16-bit LSH bands, and self-joined
    * stream-to-stream on band equality with an event-time bound —
    * exactly the batch [[graft.pipeline.Dedup.simhashPairs]]
    * candidate generation, running as ONE stateful operator whose
    * state the watermark + `horizon` bound evicts (the shape that
    * keeps a self-join runnable forever on a real ingest; an
    * unbounded self-join would retain every band row). Hamming <= 3
    * is pigeonhole-exact for 4 bands, as in the batch operator.
    *
    * Output: one row per (band_pos, earlier doc, later doc) verified
    * pair — per-band rows, so the result set is deterministic without
    * a stateful distinct. */
  def nearDupPairsStream(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", horizon: String = "2 hours",
      watermark: String = "10 minutes", maxHamming: Int = 3): DataFrame = {
    graft.functions.SearchExpressions.register(docs.sparkSession)
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    // NOT repartitioned before the fingerprint map (unlike
    // [[nearDupVsCorpusStream]]): measured best-of-4 3.8 → 4.4s at
    // sf0.1 — the simhash64 pass is one expression (vs 16 minhash
    // passes there), and the exchange is paid TWICE (both self-join
    // sides re-plan this subtree) before the state shuffle repays it
    val bands = docs
      .select(col(tsCol).as("__ts"), col("doc_id"), toks.as("__toks"))
      // tokenless docs carry no fingerprint evidence — drop them like
      // the batch operator instead of fingerprinting them all as 0
      // (every empty doc would otherwise pair at hamming 0)
      .where(size(col("__toks")) > 0)
      .select(col("__ts"), col("doc_id"),
        call_function("simhash64", col("__toks")).as("fp"))
      .select(col("__ts"), col("doc_id"), col("fp"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_pos"),
            shiftright(col("fp"), b * 16).bitwiseAND(65535).as("band_val"))): _*)).as("bb"))
      .select(col("__ts"), col("doc_id"), col("fp"),
        col("bb.band_pos").as("band_pos"), col("bb.band_val").as("band_val"))
    val a = bands.select(col("__ts").as("ts_a"), col("doc_id").as("doc_a"),
      col("fp").as("fp_a"), col("band_pos"), col("band_val"))
      .withWatermark("ts_a", watermark)
    val b = bands.select(col("__ts").as("ts_b"), col("doc_id").as("doc_b"),
      col("fp").as("fp_b"), col("band_pos").as("band_pos_b"),
      col("band_val").as("band_val_b"))
      .withWatermark("ts_b", watermark)
    a.join(b,
        col("band_pos") === col("band_pos_b") &&
          col("band_val") === col("band_val_b") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("band_pos"), col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Ingest-time near-duplicate detection against a STATIC indexed
    * corpus — the online form of [[graft.pipeline.Dedup.minhashLsh]]:
    * every arriving document is MinHash-banded MAP-SIDE
    * ([[graft.pipeline.Dedup.streamBands]], stateless), stream-static
    * joined to the corpus band table on (band, band-hash) for
    * candidates, then stream-static joined to the corpus shingle
    * table to verify exact 3-shingle Jaccard >= `threshold`. Both
    * joins are STATELESS (no watermark, no state store): all state
    * lives in the persisted static tables, so the stream runs forever
    * at constant memory — the shape of a production "is this new
    * crawl page already in the training set?" filter. Self-matches
    * are excluded by id; per (band, stream doc, corpus doc) rows keep
    * the append-mode output deterministic without a stateful
    * distinct.
    *
    * @param corpusBands    static (doc_id, band, bh) — [[graft.pipeline.Dedup.corpusLshTables]]._1
    * @param corpusShingles static (doc_id, ss)       — [[graft.pipeline.Dedup.corpusLshTables]]._2
    */
  def nearDupVsCorpusStream(docs: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, textCol: String = "text",
      threshold: Double = 0.6): DataFrame = {
    // spread the arriving slice before the banding map (guide §2.5's
    // unsplittable-input remedy): a file-per-trigger source delivers
    // each micro-batch as ONE task, and the per-doc work here
    // (tokenize → shingle → 16 minhash passes → band md5s) is the
    // batch's dominant cost — measured a single 1.22s task per batch
    // with 31 cores idle at sf0.1. Hash-repartitioning the narrow
    // (doc_id, text) rows by the deterministic doc key costs one
    // exchange of the raw slice and buys full-width compute. The
    // width is pinned to defaultParallelism (the cluster's core
    // count — scale-adaptive, not a local constant) because AQE
    // coalesces an unpinned repartition by BYTES (advisory 64MB) and
    // folded the sub-MB slice back onto one core — the wrong call
    // when per-row compute, not bytes, is the cost.
    val sb = graft.pipeline.Dedup.streamBands(
      docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id")), textCol)
    val cand = sb.join(
        corpusBands.select(col("doc_id").as("corpus_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .where(col("corpus_id") =!= col("doc_id"))
    cand.join(
        corpusShingles.select(col("doc_id").as("corpus_id"), col("ss").as("ssy")),
        Seq("corpus_id"))
      .withColumn("jaccard",
        size(array_intersect(col("ss"), col("ssy"))).cast("double") /
          size(array_union(col("ss"), col("ssy"))))
      .where(col("jaccard") >= threshold)
      .select(col("band"), col("doc_id"), col("corpus_id"),
        graft.functions.Rounding.roundEven(col("jaccard"), 4).as("jaccard"))
  }

  /** Ingest-time approximate-nearest-neighbor probe against the
    * STATIC LSH-bucketed corpus
    * ([[graft.pipeline.Similarity.corpusLshBuckets]] — the SAME
    * persisted artifact the batch `ann_lsh` entry probes): each
    * arriving vector computes its hyperplane bucket map-side, then a
    * stateless stream-static equi-join on the bucket yields
    * candidates and one codegen'd `vec_dot` per candidate scores
    * cosine; pairs at or above `minCos` emit. The embedding analog
    * of [[nearDupVsCorpusStream]]: no watermark, no state store —
    * all state lives in the persisted corpus table, so the stream
    * runs forever at constant memory, corpus-size-independent per
    * batch. A per-query top-k would need a per-key aggregate (state);
    * thresholded emission is the stateless contract, as in the
    * ingest-dedup family.
    *
    * Output: (vec_id, corpus_id, bucket, cos). */
  def annVsCorpusStream(vectors: DataFrame, corpusBuckets: DataFrame,
      nPlanes: Int = 8, minCos: Double = 0.3): DataFrame = {
    val planes = graft.pipeline.Similarity.hyperplanes(nPlanes, 64)
    val arriving = vectors
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qnrm", graft.pipeline.Similarity.norm(col("qv")))
      .withColumn("bucket", graft.pipeline.Similarity.lshBucket(col("qv"), planes))
    arriving.join(
        corpusBuckets.select(col("vec_id").as("corpus_id"), col("v"),
          col("nrm"), col("bucket")),
        Seq("bucket"))
      .where(col("corpus_id") =!= col("vec_id"))
      .withColumn("cos",
        call_function("vec_dot", col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .where(col("cos") >= minCos)
      .select(col("vec_id"), col("corpus_id"), col("bucket"),
        round(col("cos"), 4).as("cos"))
  }

  /** Percolator-style standing-query matching at ingest (the
    * Elasticsearch percolate shape — the dual of every other join
    * here: documents flow TO a static query registry instead of
    * queries flowing to a static corpus). Each registered query is
    * (query_id, probe term, required term) — an AND of two terms —
    * inverted on its probe term, so the candidate lookup is an
    * equi-join from the arriving doc's distinct tokens to the
    * broadcast registry: at most one candidate row per (doc, query).
    * Candidates verify the second term in-row against the doc's token
    * array and score BM25 with CORPUS statistics (n/avgdl/df) carried
    * in the registry columns ([[percolateRegistry]] resolves them
    * once), so an arriving doc scores exactly as the batch engine
    * would score it against the same corpus.
    *
    * Stateless: no watermark, no state store. The registry is
    * broadcast; tokenize/probe/verify/score are all map-side, so a
    * micro-batch plan has no exchange at all and the stream runs
    * forever at constant memory bounded by the registry size — at
    * 100 TB/day ingest with 10k standing queries this is one
    * broadcast and one narrow stage per batch.
    *
    * Output: (query_id, doc_id, score) — unrounded; callers round. */
  /** The percolate scoring expression, shared by the join-based and
    * the driver-compiled percolators so the two are arithmetically
    * IDENTICAL (same op order, bit-equal scores): BM25 of one query
    * term against the arriving doc's token array, with df / n /
    * avgdl supplied either as registry columns or as literals. */
  private def percolateBm25(tfc: Column, dfc: Column, nC: Column,
      avgdlC: Column, k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (nC - dfc + lit(0.5)) / (dfc + lit(0.5)))
    when(tfc > 0,
      idf * (tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * size(col("__toks")) / avgdlC)))
      .otherwise(lit(0.0))
  }

  def percolateStream(docs: DataFrame, registry: DataFrame,
      textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    def tf(t: Column) = size(filter(col("__toks"), x => x === t))
    def bm25(tfc: Column, dfc: Column) =
      percolateBm25(tfc, dfc, col("n"), col("avgdl"), k1, b)
    docs.select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(array_distinct(col("__toks"))).as("__tok"))
      .join(broadcast(registry), col("__tok") === col("t1"))
      .where(array_contains(col("__toks"), col("t2")))
      .select(col("query_id"), col("doc_id"),
        (bm25(tf(col("t1")), col("df1")) + bm25(tf(col("t2")), col("df2"))).as("score"))
  }

  /** Driver-COMPILED percolator for bounded registries (r15 verdict
    * stretch): the registry — already |queries| rows with collected
    * corpus stats — is collected once and compiled into ONE map-side
    * pass: per arriving doc, an array of per-query
    * (query_id, score-or-null) structs evaluated directly on the
    * token array, exploded, nulls dropped. Versus
    * [[percolateStream]] this removes the per-batch token explode
    * (|doc| x |distinct tokens| rows), the broadcast hash join and
    * its exchange — the per-batch plan is scan -> project ->
    * explode(|queries|) -> filter, and a query whose terms are
    * absent from the arriving doc short-circuits in the codegen'd
    * array_contains instead of producing join probes. Scores are
    * BIT-IDENTICAL to the join form (shared [[percolateBm25]], same
    * op order; pinned in StreamingSpec). Use the join form when the
    * registry is too large to compile into a plan (thousands of
    * standing queries); this form when it is dashboard-sized. */
  def percolateStreamCompiled(docs: DataFrame, registry: DataFrame,
      textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    def tf(t: String) = size(filter(col("__toks"), x => x === lit(t)))
    val rows = registry
      .select(col("query_id"), col("t1"), col("t2"), col("df1"),
        col("df2"), col("n"), col("avgdl"))
      .collect()
    val qStructs = rows.toSeq.map { r =>
      val (qid, t1, t2) = (r.getLong(0), r.getString(1), r.getString(2))
      val score =
        percolateBm25(tf(t1), lit(r.getLong(3)), lit(r.getLong(5)),
          lit(r.getDouble(6)), k1, b) +
        percolateBm25(tf(t2), lit(r.getLong(4)), lit(r.getLong(5)),
          lit(r.getDouble(6)), k1, b)
      struct(lit(qid).as("query_id"),
        when(array_contains(col("__toks"), lit(t1)) &&
          array_contains(col("__toks"), lit(t2)), score).as("score"))
    }
    docs.select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(array(qStructs: _*)).as("__q"))
      .where(col("__q.score").isNotNull)
      .select(col("__q.query_id").as("query_id"), col("doc_id"),
        col("__q.score").as("score"))
  }

  /** Builds the [[percolateStream]] registry from a static corpus:
    * one corpus pass for df of the registered terms, one for
    * (n, avgdl), both ending in frames bounded by |queries|. The
    * result is TINY (one row per standing query) — callers should
    * persist (or write) it once, since the static side of a
    * stream-static join is re-evaluated every micro-batch and the
    * corpus aggregations must not re-run per batch. */
  def percolateRegistry(corpus: DataFrame,
      queries: Seq[(Long, String, String)], textCol: String = "text"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val toks = graft.analysis.Analyzers.default.tokensCol(col(textCol))
    val terms = queries.flatMap(q => Seq(q._2, q._3)).distinct
    val dfTab = corpus.select(explode(array_distinct(toks)).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nav = corpus.select(toks.as("__toks"))
      .agg(count(lit(1)).as("n"), avg(size(col("__toks"))).as("avgdl"))
    queries.toDF("query_id", "t1", "t2")
      .join(dfTab.select(col("term").as("t1"), col("df").as("df1")), Seq("t1"), "left")
      .join(dfTab.select(col("term").as("t2"), col("df").as("df2")), Seq("t2"), "left")
      .na.fill(0L, Seq("df1", "df2"))
      .crossJoin(nav)
  }

  /** Ingest-time exact-substring detection against a STATIC corpus
    * gram table — the online complement of
    * [[graft.pipeline.Dedup.substringSpans]]: every k-token window of
    * an arriving document is hashed map-side
    * ([[graft.pipeline.Dedup.streamGrams]], stateless) and
    * stream-static joined to the corpus gram statistics; a window is
    * flagged when SOME OTHER corpus document contains it (n_docs >= 2,
    * or the single owner isn't the arriving doc — within-doc
    * repetition is not corpus duplication, unlike the batch
    * [[graft.pipeline.Dedup.substringSpans]] occurrence count).
    * Stateless: no watermark, no state store; all state lives in the
    * persisted corpus table, so the stream runs forever at constant
    * memory. Span-merging the flagged windows is a per-doc batch step
    * downstream ([[graft.pipeline.Dedup.substringSpans]]'s islands
    * window) — merging needs the doc's full window set, which a
    * stateless stream by definition does not hold. */
  def substringVsCorpusStream(docs: DataFrame, corpusGrams: DataFrame,
      textCol: String = "text", k: Int = 8): DataFrame =
    graft.pipeline.Dedup.streamGrams(docs, textCol, k)
      .join(corpusGrams, Seq("h"))
      .where(col("n_docs") >= 2 || col("min_doc") =!= col("doc_id"))
      .select(col("doc_id"), col("pos"), col("n_docs").as("n_corpus_docs"))

  /** Convenience: run a streaming query over a memory sink until all
    * available data is processed; returns the sink table name.
    *
    * State-store partition count: a stream pins its shuffle-partition
    * count (and thus its state-store instance count) at first start —
    * it does not AQE-coalesce like batch. Size it to the stream's
    * load, not the session's batch default: every state partition
    * costs a provider + maintenance task + per-batch commit whatever
    * its size. `streamPartitions` bounds it for these bounded-replay
    * runs (a production deployment would set it to match ingest
    * volume); the session's batch setting is restored after start. */
  /** The END-TO-END ingest DAG as ONE streaming query — the chain a
    * production crawl-ingest deployment runs per arriving document,
    * composed from the individually-verified stream operators with a
    * SINGLE pass per micro-batch:
    *
    *   1. online URL dedup — canonicalize ([[graft.pipeline.Urls
    *      .normalizeUrl]]) + `dropDuplicatesWithinWatermark` on the
    *      canonical key. The ONLY stateful operator in the plan
    *      (state bounded by the watermark horizon).
    *   2. curation gate — token/quality thresholds, stateless
    *      ([[curateStream]]'s predicates inline, tokens computed once
    *      and shared with step 3).
    *   3. near-dup vs corpus — GRAIN-PRESERVING form of
    *      [[nearDupVsCorpusStream]]: the arriving doc carries its 4
    *      band hashes as columns ([[graft.pipeline.Dedup
    *      .withBandColumns]]) and LEFT-joins the capped per-bucket
    *      candidate dictionary ([[graft.pipeline.Dedup
    *      .corpusBandCandidates]]) once per band; the Jaccard verify
    *      runs as an in-row `exists` over the candidate array, so the
    *      doc row is never exploded and no re-aggregation (= no
    *      second state store) is needed.
    *   4. ANN vs corpus — the embedding analog: the static embeddings
    *      table attaches the doc's vector (stream-static left join on
    *      the shared id), the hyperplane bucket is computed map-side,
    *      one left join against [[graft.pipeline.Similarity
    *      .corpusBucketCandidates]], cosine verify in-row.
    *   5. chunking of the fully-surviving docs ([[graft.pipeline
    *      .Curation.chunked]], stateless) — the training-ready
    *      output.
    *
    * Scale shape: per micro-batch, 4+2 stream-static equi-joins (the
    * static sides persisted/bucketable, only the arriving slice
    * shuffles) + map-side signatures/predicates; state = one
    * canonical-URL dedup store. Output: (doc_id, chunk_idx,
    * n_tokens, chunk_text) chunk rows. */
  def ingestE2eStream(docs: DataFrame, bandCandsByBand: Seq[DataFrame],
      embeddings: DataFrame, bucketCands: DataFrame,
      nPlanes: Int = 8, minCos: Double = 0.3, jaccardThr: Double = 0.6,
      minTokens: Int = 16, minQuality: Double = 0.05,
      watermark: String = "3650 days"): DataFrame = {
    require(bandCandsByBand.size == 4, "one candidate dictionary per band")
    graft.functions.SearchExpressions.register(docs.sparkSession)
    import graft.pipeline.{Curation, Dedup, Similarity, TextAnalysis, Urls}
    // 1. online URL dedup (the one stateful op)
    val urlDeduped = Urls.withUrlColumns(docs)
      .withColumn("canonical", Urls.normalizeUrl(col("url")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canonical")
    // 2. curation gate (tokens computed once, shared with banding)
    val curated = urlDeduped
      .withColumn("__toks", graft.analysis.Analyzers.default.tokensCol(col("text")))
      .where(size(col("__toks")) >= minTokens &&
        TextAnalysis.qualityExpr(col("__toks")) >= minQuality)
    // 3. near-dup vs corpus, grain-preserving
    val banded = Dedup.withBandColumns(curated, col("__toks"))
    // per-band dictionaries (r17): each is lineage-cut with an honest
    // quarter-size estimate — at bench SFs the planner broadcasts it
    // (no exchange on either side of the per-batch join); at corpus
    // scale the registry's baked-in bh partitioning + ordering keep
    // the static side exchange- and sort-free under the fallback SMJ
    val withBandCands = (0 until 4).foldLeft(banded)((acc, b) =>
      acc.join(
        bandCandsByBand(b)
          .select(col("bh").as(s"bh_$b"), col("cands").as(s"__cands_$b")),
        Seq(s"bh_$b"), "left"))
    // candidates are shingle-profile GROUPS (hot-bucket escape, see
    // corpusBandCandidates): the probe matches a group iff the group
    // contains some OTHER doc — more than one member, or a min id
    // that is not the probe itself — and the Jaccard clears
    val nearDup = size(col("ss")) > 0 && (0 until 4).map(b =>
      Dedup.profileMatchExpr(col(s"__cands_$b"), col("ss"),
        col("doc_id"), jaccardThr)).reduce(_ || _)
    // 4. ANN vs corpus, grain-preserving
    val planes = Similarity.hyperplanes(nPlanes, 64)
    val withVec = withBandCands.join(
        embeddings.select(col("vec_id").as("__vid"),
          col("embedding").cast("array<double>").as("__qv")),
        col("__vid") === col("doc_id"), "left")
      .withColumn("__qnrm", Similarity.norm(col("__qv")))
      .withColumn("__bucket", Similarity.lshBucket(col("__qv"), planes))
    val withAnn = withVec.join(
      bucketCands.select(col("bucket").as("__bucket"),
        col("cands").as("__vcands")),
      Seq("__bucket"), "left")
    val annDup = coalesce(exists(col("__vcands"), c =>
      c.getField("corpus_id") =!= col("doc_id") &&
        call_function("vec_dot", col("__qv"), c.getField("v")) /
          (col("__qnrm") * c.getField("nrm")) >= minCos),
      lit(false))
    // 5. chunk the survivors
    Curation.chunked(withAnn.where(!nearDup && !annDup)
      .select(col("doc_id"), col("text")))
  }

  def runToMemorySink(df: DataFrame, name: String, mode: OutputMode,
      streamPartitions: Int = 8): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val q = try {
      spark.conf.set(key, streamPartitions.toString)
      df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(key, saved)
    q.awaitTermination()
  }

  /** File-sink harness for CORPUS-SIZED streaming outputs: the memory
    * sink holds every row on the driver for the life of the process,
    * which caps how far the heavy annotation streams (per-(doc, term)
    * grain — ~1.5M rows at sf0.1 for the CMS entry, linear beyond)
    * can scale. Here the stream lands in a temp parquet sink —
    * executor-parallel, driver-flat — and the returned frame is the
    * read-back. Append-mode only (the file sink cannot express
    * Update/Complete), which every stateless annotation stream is. */
  def runToFileSink(df: DataFrame, streamPartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_sink_ckpt").toString
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val q = try {
      spark.conf.set(key, streamPartitions.toString)
      df.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(key, saved)
    q.awaitTermination()
    spark.read.parquet(out)
  }

  /** [[runToFileSink]] for COMPLETE-mode aggregation streams (the
    * file sink itself cannot express Complete): each trigger's full
    * result table overwrites the temp parquet dir through
    * foreachBatch — an executor-parallel write, nothing retained on
    * the driver — and the read-back after the final trigger is the
    * stream's answer. */
  def runCompleteToFileSink(df: DataFrame,
      streamPartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_csink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_csink_ckpt").toString
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val q = try {
      spark.conf.set(key, streamPartitions.toString)
      df.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    } finally spark.conf.set(key, saved)
    q.awaitTermination()
    spark.read.parquet(out)
  }
}
