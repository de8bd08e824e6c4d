package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

  test("tumbling window aggregation over a real stream (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts(0), "click", 1L, 1.0),
      Ev(ts(10), "click", 1L, 2.0),
      Ev(ts(70), "view", 2L, 5.0),
      // sentinel far in the future: advances the watermark so the
      // earlier windows close and emit in Append mode
      Ev(ts(100000), "flush", 9L, 0.0))
    EventStreams.runToMemorySink(
      EventStreams.tumblingCounts(mem.toDF()), "tumbling_sink", OutputMode.Append())
    val got = spark.table("tumbling_sink")
      .where($"event_type" =!= "flush")
      .select($"event_type", $"n", $"sum_value".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("session windows split on 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts(0), "click", 1L, 1.0),
      Ev(ts(10), "click", 1L, 1.0), // same session
      Ev(ts(100), "click", 1L, 1.0), // new session
      Ev(ts(100000), "flush", 9L, 0.0))
    EventStreams.runToMemorySink(
      EventStreams.sessionize(mem.toDF()), "session_sink", OutputMode.Append())
    val got = spark.table("session_sink")
      .where($"user_id" === 1L)
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 1L), (1L, 2L)))
  }

  test("mapGroupsWithState accumulates per-user stats incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    mem.addData(
      EventStreams.UserEvent(1L, ts(0), 2.0),
      EventStreams.UserEvent(1L, ts(1), 3.0),
      EventStreams.UserEvent(2L, ts(2), 10.0))
    EventStreams.runToMemorySink(
      EventStreams.runningUserStats(mem.toDS()).toDF(), "state_sink", OutputMode.Update())
    val got = spark.table("state_sink")
      .as[EventStreams.UserStats].collect().map(s => s.user_id -> (s.n_events, s.total_value)).toMap
    assert(got(1L) == ((2L, 5.0)))
    assert(got(2L) == ((1L, 10.0)))
  }

  test("incremental term stats update across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = EventStreams.incrementalTermStats(mem.toDF().toDF("text"))
      .writeStream.format("memory").queryName("termstats_sink")
      .outputMode(OutputMode.Complete()).start()
    mem.addData("a b a")
    q.processAllAvailable()
    val after1 = spark.table("termstats_sink").as[(String, Long)].collect().toMap
    assert(after1 == Map("a" -> 2L, "b" -> 1L))
    mem.addData("b c")
    q.processAllAvailable()
    val after2 = spark.table("termstats_sink").as[(String, Long)].collect().toMap
    assert(after2 == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    q.stop()
  }

  test("streaming dedup keeps first arrival, bounds state by watermark") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String, ts: Timestamp)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = EventStreams.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "same text", ts(0)), (2L, "same text", ts(1)), (3L, "other", ts(2)))
    q.processAllAvailable()
    mem.addData((4L, "same text", ts(3))) // dup within watermark → dropped
    q.processAllAvailable()
    val got = spark.table("dedup_sink").select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
    q.stop()
  }

  test("streaming simhash pairs flag a later near-copy, not unrelated docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = EventStreams.nearDupPairsStream(docs,
        horizon = "2 hours", watermark = "10 minutes")
      .writeStream.format("memory").queryName("simhash_sink")
      .outputMode(OutputMode.Append()).start()
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    mem.addData(
      (1L, base, ts(0)),
      (2L, base, ts(5)), // exact copy -> hamming 0, all 4 bands collide
      (3L, "one two three four five six seven eight", ts(10)))
    q.processAllAvailable()
    val got = spark.table("simhash_sink")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    // identical fingerprints collide in every band: 4 per-band rows
    assert(got.count(r => r._1 == 1L && r._2 == 2L && r._3 == 0) == 4, got.toSeq)
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L), s"unrelated doc paired: ${got.toSeq}")
    q.stop()
  }

  test("ingest dedup vs static corpus flags near-copies, stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different corpus content about spark engines")
    ).toDF("doc_id", "text")
    val corpusBands = Dedup.streamBands(corpus)
      .select("doc_id", "band", "bh")
    val corpusShingles = Dedup.streamBands(corpus)
      .select("doc_id", "ss").distinct()
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = EventStreams.nearDupVsCorpusStream(docs, corpusBands, corpusShingles)
    val q = out.writeStream.format("memory").queryName("dvc_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // exact copy of 100
      (2L, "nothing in common with anything here at all whatsoever"))
    q.processAllAvailable()
    val got = spark.table("dvc_sink")
      .select("doc_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 == 1L && r._2 == 100L && r._3 == 1.0), got.toSeq)
    // stateless: the plan must not have grown a state store
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
  }

  test("streaming Bloom probe matches the batch entry and stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val dir = "/root/testdata/sf0.001"
    val batch = Dedup.bloomMembership(spark, dir)
      .as[(Long, Boolean, Boolean)].collect().toSet
    val bitset = Dedup.corpusBloomBitset(spark, dir)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = Dedup.bloomVsCorpus(docs, bitset)
    val q = out.writeStream.format("memory").queryName("bloom_sink")
      .outputMode(OutputMode.Append()).start()
    // replay the corpus as the arriving stream in two batches
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (a, b) = rows.splitAt(rows.length / 2)
    mem.addData(a.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b.toIndexedSeq)
    q.processAllAvailable()
    val got = spark.table("bloom_sink")
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(got == batch, "stream rows diverge from the batch Bloom entry")
    // stateless: k joins, no aggregation, no state store
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
  }

  test("bloom/CMS probes reject artifacts built with other parameters") {
    import graft.pipeline.{Dedup, TextAnalysis}
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    // a bitset built at m=2^14 probed at m=2^12: the positions would
    // be computed with the wrong modulus — must fail, not mis-answer
    val bitset = Dedup.corpusBloomBitset(spark, dir)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.bloomVsCorpus(docs, bitset, mBits = 1 << 12)
    }
    assert(e1.getMessage.contains("mBits"), e1.getMessage.take(200))
    // same for the CMS sketch's width
    val sketch = TextAnalysis.cmsSketch(spark, dir, 1024, 3)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.cmsEstimateStream(docs, sketch, w = 512)
    }
    assert(e2.getMessage.contains("cms.w"), e2.getMessage.take(200))
    // matching parameters still pass (the stamped frame round-trips)
    assert(Dedup.bloomVsCorpus(docs, bitset).columns.contains("in_bloom"))
  }

  test("streaming CMS annotation matches the batch form and stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextAnalysis
    val dir = "/root/testdata/sf0.001"
    val sketch = TextAnalysis.cmsSketch(spark, dir, 1024, 3)
    // the same column pipeline over a BATCH frame is the reference
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val batch = TextAnalysis.cmsEstimateStream(docs, sketch)
      .as[(Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    // every corpus term's estimate is >= its true corpus frequency
    val truth = docs
      .select(explode(graft.analysis.Analyzers.default.tokensCol(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(batch.forall { case (_, t, est) => est >= truth(t) })
    val mem = MemoryStream[(Long, String)]
    val out = TextAnalysis.cmsEstimateStream(
      mem.toDF().toDF("doc_id", "text"), sketch)
    val q = out.writeStream.format("memory").queryName("cms_sink")
      .outputMode(OutputMode.Append()).start()
    val rows = docs.as[(Long, String)].collect()
    val (a, b) = rows.splitAt(rows.length / 2)
    mem.addData(a.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b.toIndexedSeq)
    q.processAllAvailable()
    val got = spark.table("cms_sink")
      .as[(Long, String, Long)].collect().toSet
    assert(got == batch, "stream rows diverge from the batch CMS annotation")
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
  }

  test("ingest substring detection flags only cross-doc windows, stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // corpus: doc 200 carries an 8-token run; doc 201 repeats its own
    // 8-token run twice but shares nothing with anyone
    val run = (0 until 8).map(i => s"s$i").mkString(" ")
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val corpus = Seq(
      (200L, s"$run filler1 filler2"),
      (201L, s"$rep join1 join2 $rep")
    ).toDF("doc_id", "text")
    val grams = Dedup.streamGrams(corpus)
      .groupBy("h")
      .agg(count_distinct(col("doc_id")).as("n_docs"), min("doc_id").as("min_doc"))
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = EventStreams.substringVsCorpusStream(docs, grams)
    val q = out.writeStream.format("memory").queryName("ssvc_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, s"prefix1 $run suffix1"), // window at pos 1 duplicates doc 200
      (2L, "nothing in common with anything here at all whatsoever"))
    q.processAllAvailable()
    val got = spark.table("ssvc_sink")
      .select("doc_id", "pos", "n_corpus_docs")
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((1L, 1, 1L)), got.toSeq)
    // doc 201's WITHIN-doc repeat must not flag an arriving replay of
    // 201's own text (min_doc == arriving doc, n_docs == 1)
    mem.addData((201L, s"$rep join1 join2 $rep"))
    q.processAllAvailable()
    val got2 = spark.table("ssvc_sink")
      .select("doc_id").where(col("doc_id") === 201L).count()
    assert(got2 == 0, "own within-doc repetition must not flag")
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
  }

  test("ingest ANN probes the bucketed corpus, stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Similarity
    graft.functions.SearchExpressions.register(spark)
    val planes = Similarity.hyperplanes(8, 64)
    val base = Array.tabulate(64)(i => math.sin(i + 1.0))
    val other = Array.tabulate(64)(i => math.cos(3.0 * i) * (if (i % 2 == 0) 1.0 else -1.0))
    val corpus = Seq((100L, base.toSeq), (101L, other.toSeq)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .withColumn("bucket", Similarity.lshBucket(col("v"), planes))
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val out = EventStreams.annVsCorpusStream(vecs, corpus, minCos = 0.9)
    val q = out.writeStream.format("memory").queryName("annvc_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, base.toSeq),  // identical to corpus vector 100 -> cos 1.0
      (2L, other.map(-_).toSeq)) // anti-parallel to 101 -> cos -1, below threshold
    q.processAllAvailable()
    val got = spark.table("annvc_sink")
      .select("vec_id", "corpus_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 100L, 1.0)), got.toSeq)
    // stateless: the plan must not have grown a state store — the
    // online-ANN contract (thresholded emission, no per-key top-k)
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
  }

  test("percolate: standing queries match arriving docs, stateless") {
    implicit val sqlCtx = spark.sqlContext
    // corpus of 3 docs; registered query 7 = (alpha AND beta)
    val corpus = Seq(
      (100L, "alpha beta gamma"),
      (101L, "alpha alpha delta"),
      (102L, "beta beta beta")).toDF("doc_id", "text")
    val reg = EventStreams.percolateRegistry(corpus, Seq((7L, "alpha", "beta")))
    // registry carries the corpus stats: n=3, avgdl=3, df(alpha)=2, df(beta)=2
    val r = reg.collect()(0)
    assert(r.getAs[Long]("n") == 3L && r.getAs[Double]("avgdl") == 3.0)
    assert(r.getAs[Long]("df1") == 2L && r.getAs[Long]("df2") == 2L)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = EventStreams.percolateStream(docs, reg)
      .writeStream.format("memory").queryName("perc_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, "alpha beta"),     // matches: both terms present
      (2L, "alpha gamma"),    // no beta -> no match
      (3L, "beta beta alpha beta")) // matches, higher beta tf
    q.processAllAvailable()
    val got = spark.table("perc_sink")
      .select($"query_id", $"doc_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((7L, 1L), (7L, 3L)))
    // doc 1: dl=2, tf=1 each term; expected BM25 against the corpus
    // stats above, exactly as the batch engine scores a 2-term AND
    val idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    def bm(tf: Int, dl: Int) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    assert(math.abs(got(0)._3 - (bm(1, 2) + bm(1, 2))) < 1e-12)
    assert(math.abs(got(1)._3 - (bm(1, 4) + bm(3, 4))) < 1e-12)
    // stateless: broadcast registry + map-side verify, no state store
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()

    // COMPILED percolator parity: identical rows and BIT-identical
    // scores to the join form (shared scoring expression), via one
    // map-side pass with no join in the per-batch plan
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.percolateStreamCompiled(
        mem2.toDF().toDF("doc_id", "text"), reg)
      .writeStream.format("memory").queryName("perc_sink_compiled")
      .outputMode(OutputMode.Append()).start()
    mem2.addData(
      (1L, "alpha beta"),
      (2L, "alpha gamma"),
      (3L, "beta beta alpha beta"))
    q2.processAllAvailable()
    val got2 = spark.table("perc_sink_compiled")
      .select($"query_id", $"doc_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got2.toSeq == got.toSeq, s"compiled ${got2.toSeq} vs join ${got.toSeq}")
    assert(q2.lastProgress.stateOperators.isEmpty)
    q2.stop()
  }

  test("transformWithState keeps a bounded running top-k per user") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventStreams.ScoredItem]
      val q = EventStreams.runningTopKPerUser(mem.toDS(), k = 2)
        .toDF().writeStream.format("memory").queryName("topk_state_sink")
        .outputMode(OutputMode.Update()).start()
      mem.addData(
        EventStreams.ScoredItem(1L, 100L, 0.3),
        EventStreams.ScoredItem(1L, 101L, 0.9))
      q.processAllAvailable()
      mem.addData(EventStreams.ScoredItem(1L, 102L, 0.5)) // evicts 100 (0.3)
      q.processAllAvailable()
      val mid = spark.table("topk_state_sink")
        .as[EventStreams.UserTopK].collect().last
      assert(mid.items == Seq(101L, 102L) && mid.scores == Seq(0.9, 0.5))
      // rescoring an item must move it, not duplicate it
      mem.addData(EventStreams.ScoredItem(1L, 102L, 0.95))
      q.processAllAvailable()
      val last = spark.table("topk_state_sink")
        .as[EventStreams.UserTopK].collect().last
      assert(last.items == Seq(102L, 101L) && last.scores == Seq(0.95, 0.9))
      q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("trending terms: windowed term counts, ranked at the sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val docs = mem.toDF().toDF("text", "ts")
    val q = EventStreams.trendingTerms(docs)
      .writeStream.format("memory").queryName("trending_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      ("spark joins spark", ts(0)),
      ("spark windows", ts(10)),
      ("flush", ts(100000)))
    q.processAllAvailable()
    import org.apache.spark.sql.expressions.Window
    val ranked = spark.table("trending_sink")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"win_start").orderBy($"n".desc, $"term")))
      .where($"rank" === 1 && $"term" =!= "flush")
      .select("term", "n").as[(String, Long)].collect().toSet
    assert(ranked == Set(("spark", 3L)))
    q.stop()
  }

  test("sliding windows emit overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Ev(ts(20), "click", 1L, 4.0), Ev(ts(100000), "flush", 9L, 0.0))
    EventStreams.runToMemorySink(
      EventStreams.slidingAvg(mem.toDF()), "sliding_sink", OutputMode.Append())
    // a single event at minute 20 falls into 4 hourly windows sliding by 15m
    assert(spark.table("sliding_sink").where($"event_type" === "click").count() == 4)
  }

  test("stream-static enrichment joins the broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts(0), "click", 1L, 1.5), Ev(ts(1), "click", 2L, 2.5),
      Ev(ts(2), "view", 1L, 3.0))
    val dim = Seq((1L, "BUILDING"), (2L, "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
    EventStreams.runToMemorySink(
      EventStreams.enrichWithSegments(mem.toDF(), dim),
      "enrich_sink", OutputMode.Complete())
    val got = spark.table("enrich_sink")
      .select($"segment", $"event_type", $"n", $"sum_value".cast("double"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("BUILDING", "click", 1L, 1.5),
      ("BUILDING", "view", 1L, 3.0),
      ("AUTOMOBILE", "click", 1L, 2.5)))
  }

  test("stream-stream interval join matches purchases within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    // Ev has no event_id slot — carry the id in `value` and cast it out
    val cdf = clicks.toDF()
      .select(col("user_id"), (col("value")).cast("long").as("event_id"), col("ts"))
    val pdf = purchases.toDF()
      .select(col("user_id"), (col("value")).cast("long").as("event_id"), col("ts"))
    clicks.addData(
      Ev(ts(0), "click", 1L, 100), // matched by purchase 200 (30 min later)
      Ev(ts(0), "click", 2L, 101)) // user 2 purchase is 2h later: no match
    purchases.addData(
      Ev(ts(30), "purchase", 1L, 200),
      Ev(ts(120), "purchase", 2L, 201),
      Ev(ts(100000), "purchase", 9L, 999)) // watermark flush
    EventStreams.runToMemorySink(
      EventStreams.clickToPurchase(cdf, pdf), "sjoin_sink", OutputMode.Append())
    val got = spark.table("sjoin_sink")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 200L)))
  }

  test("funnel machine carries stage state across micro-batches, enforces strict order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.FunnelEvent
    val mem = MemoryStream[FunnelEvent]
    val out = EventStreams.funnelStream(mem.toDS()).toDF()
    val q = out.writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 views; user 2 purchases first (wrong order)
    mem.addData(
      FunnelEvent(1L, "view", ts(0), 1L),
      FunnelEvent(2L, "purchase", ts(0), 2L),
      FunnelEvent(2L, "click", ts(1), 3L))
    q.processAllAvailable()
    assert(spark.table("funnel_sink").isEmpty)
    // batch 2: user 1 completes across the batch boundary (state
    // carried); user 2 views too late — stages must be strictly
    // ordered per user, so no completion for them
    mem.addData(
      FunnelEvent(1L, "click", ts(5), 4L),
      FunnelEvent(1L, "purchase", ts(9), 5L),
      FunnelEvent(2L, "view", ts(6), 6L))
    q.processAllAvailable()
    val got = spark.table("funnel_sink")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L), got)
    val r = got.head
    assert(r._2 < r._3 && r._3 < r._4, r)
    // a second purchase must not emit again (terminal state)
    mem.addData(FunnelEvent(1L, "purchase", ts(20), 7L))
    q.processAllAvailable()
    assert(spark.table("funnel_sink").count() == 1)
    q.stop()
  }

  test("stateful aggregation resumes from a checkpoint: state and offsets recover") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("ckpt_out").toString
    val cp = java.nio.file.Files.createTempDirectory("ckpt_meta").toString
    val mem = MemoryStream[Ev]
    def start() = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").cast("long").as("win_start"),
        col("event_type"), col("count").as("n"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    // first incarnation: two clicks land in hour-window 0, state
    // holds the partial count when the query stops
    val q1 = start()
    mem.addData(Ev(ts(0), "click", 1L, 1.0), Ev(ts(10), "click", 2L, 1.0))
    q1.processAllAvailable(); q1.stop()
    // second incarnation from the SAME checkpoint: one more click in
    // the same window, then a far-future sentinel closes it
    val q2 = start()
    mem.addData(Ev(ts(20), "click", 3L, 1.0), Ev(ts(100000), "flush", 9L, 0.0))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out)
      .where(col("event_type") === "click")
      .select("n").as[Long].collect()
    // 3, not 1: the restarted query recovered the pre-restart partial
    // count (2) from the state store and added the third event —
    // offsets also recovered (no double-counting of batch one)
    assert(got.toSeq == Seq(3L), got.toSeq)
  }

  test("ingest chunking emits the batch chunker's windows, stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    val text40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = graft.pipeline.Curation.chunked(docs)
    val q = out.writeStream.format("memory").queryName("chunk_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, text40), (2L, "short doc"))
    q.processAllAvailable()
    val got = spark.table("chunk_sink")
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // 40 tokens, window 32 / stride 24 -> chunks at 0 (32 toks) and 24 (16 toks)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 0L, 32L), (1L, 1L, 16L), (2L, 0L, 2L)), got.toSeq)
    assert(got.head._4 == (1 to 32).map(i => s"w$i").mkString(" "))
    assert(q.lastProgress.stateOperators.isEmpty)
    q.stop()
  }

  test("ingest curation gate filters by length and quality, stays stateless") {
    implicit val sqlCtx = spark.sqlContext
    val longDoc = (1 to 40).map(i => s"word$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = EventStreams.curateStream(docs)
    val q = out.writeStream.format("memory").queryName("curate_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, longDoc),                       // passes: 40 distinct tokens
      (2L, "too short to keep"),           // fails the min-token gate
      (3L, ("the " * 40).trim))            // 40 tokens but quality ~0 (all stopword)
    q.processAllAvailable()
    val got = spark.table("curate_sink")
      .select("doc_id", "pred_lang", "n_tokens", "quality", "n_pii")
      .as[(Long, String, Long, Double, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1L), got.toSeq)
    val r = got.head
    assert(r._3 == 40 && r._4 >= 0.05 && r._5 == 0L, r)
    // stateless: no state store in the micro-batch plan
    assert(q.lastProgress.stateOperators.isEmpty,
      q.lastProgress.stateOperators.mkString(","))
    q.stop()
    // batch/stream agreement: the same expressions drive the batch
    // langId, so the kept doc's language pick must match it
    import graft.pipeline.TextAnalysis
    graft.functions.SearchExpressions.register(spark)
    val batchPred = Seq((1L, longDoc)).toDF("doc_id", "text")
      .select(TextAnalysis.langPredFromCounts(TextAnalysis.langCountsExpr(
        graft.analysis.Analyzers.default.tokensCol(col("text")))).as("p"))
      .as[String].head()
    assert(r._2 == batchPred)
  }

  test("ingest e2e DAG runs with exactly ONE state store (the URL dedup)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val bandCands = graft.pipeline.Dedup.corpusBandCandidatesByBand(spark, dir)
    val bucketCands = graft.pipeline.Similarity.corpusBucketCandidates(spark, dir)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
      .withColumn("ts", timestamp_micros(
        lit(1699999200L * 1000000L) + col("doc_id") * 60L * 1000000L))
    val out = EventStreams.ingestE2eStream(stream, bandCands, emb, bucketCands)
    val q = out.writeStream.format("memory").queryName("e2e_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      // two-phase arrival: evens first, then their odd URL-twins
      mem.addData(docs.filter(_._1 % 2 == 0): _*)
      q.processAllAvailable()
      mem.addData(docs.filter(_._1 % 2 == 1): _*)
      q.processAllAvailable()
      // the WHOLE composed DAG carries one state store: the
      // canonical-URL dedup. Every other stage (gate, near-dup vs
      // corpus, ANN vs corpus, chunking) is stateless stream-static.
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 1, s"expected 1 state operator, got: ${ops.mkString(",")}")
      assert(ops.head.operatorName.toLowerCase.contains("dedup"),
        s"unexpected state operator: ${ops.head.operatorName}")
      // the odd twin of every page was dropped by the URL dedup
      val outDocs = spark.table("e2e_spec").select("doc_id")
        .distinct().as[Long].collect()
      assert(outDocs.nonEmpty)
      assert(outDocs.forall(_ % 2 == 0),
        s"odd URL-duplicate leaked: ${outDocs.filter(_ % 2 == 1).take(5).mkString(",")}")
    } finally q.stop()
  }
}
