package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("decontaminate: eval docs excluded, hit counts bounded by gram counts") {
    val out = Curation.decontaminate(spark, dir)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (id, _, _, _) => id % 20 != 0 }, "eval split must not appear")
    assert(out.forall { case (_, nGrams, nHit, frac) =>
      nHit <= nGrams && frac >= 0.0 && frac <= 1.0
    })
    // a train doc sharing ALL its grams with itself is impossible; but a
    // doc with zero grams must report frac 0, not NaN
    assert(out.filter(_._2 == 0).forall(_._4 == 0.0))
  }

  test("decontaminate flags a duplicated eval document") {
    // doc 0 is in the eval split (0 % 20 == 0); any exact dup of it in
    // the train split must report contam_frac 1.0. The sf0.001 corpus
    // may not contain one, so check the invariant differentially: every
    // train doc's hit grams must be a subset of the eval gram set.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .select(col("doc_id"), Dedup.shingles(col("tokens"), 5).as("grams"))
    val evalGrams = docs.where(col("doc_id") % 20 === 0)
      .select(explode(col("grams")).as("g")).distinct()
      .as[String].collect().toSet
    val out = Curation.decontaminate(spark, dir).as[(Long, Int, Long, Double)].collect()
    val trainGrams = docs.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("grams")).as[(Long, Seq[String])].collect().toMap
    out.foreach { case (id, _, nHit, _) =>
      val expected = trainGrams(id).count(evalGrams.contains)
      assert(nHit == expected, s"doc $id: expected $expected hits, got $nHit")
    }
  }

  test("stratifiedSample: deterministic, respects per-language rates") {
    val a = Curation.stratifiedSample(spark, dir).as[(Long, String, Long)].collect()
    val b = Curation.stratifiedSample(spark, dir).as[(Long, String, Long)].collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be deterministic")
    val rates = Curation.SampleRates.toMap
    a.foreach { case (_, lang, bucket) =>
      assert(bucket >= 0 && bucket < 100)
      assert(bucket < rates.getOrElse(lang, 100), s"$lang bucket $bucket over rate")
    }
    // the downsampled language must actually be downsampled
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(kept.getOrElse("en", 0L) < total("en"), "en must lose rows at rate 30")
    assert(kept.getOrElse("de", 0L) == total("de"), "de keeps all rows at rate 100")
  }

  test("packSequences: offsets are contiguous per stream, packs consistent") {
    val out = Curation.packSequences(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(r => (r._2, r._3)).foreach { case (stream, rows) =>
      val sorted = rows.sortBy(_._1)
      var expect = 0L
      sorted.foreach { case (id, _, _, nTok, start, sp, ep) =>
        assert(start == expect, s"stream $stream doc $id: offset $start != $expect")
        assert(sp == start / 256, s"doc $id start_pack")
        assert(ep == (start + math.max(nTok, 1) - 1) / 256, s"doc $id end_pack")
        assert(ep >= sp)
        expect += nTok
      }
    }
  }

  test("winnowing native expression equals the Column pipeline") {
    val fast = TextAnalysis.winnowing(spark, dir)
      .as[(Long, Int, String)].collect().toSeq
    val ref = TextAnalysis.winnowingViaColumns(spark, dir)
      .as[(Long, Int, String)].collect().toSeq
    assert(fast == ref)
    // and with non-default window/shingle sizes, incl. w > doc length
    val fast2 = TextAnalysis.winnowing(spark, dir, n = 3, w = 7)
      .as[(Long, Int, String)].collect().toSeq
    val ref2 = TextAnalysis.winnowingViaColumns(spark, dir, n = 3, w = 7)
      .as[(Long, Int, String)].collect().toSeq
    assert(fast2 == ref2)
  }

  test("fingerprints native min-shingle equals the Column pipeline") {
    val fast = TextAnalysis.fingerprints(spark, dir)
      .as[(Long, String, String, String)].collect().toSeq
    val ref = TextAnalysis.fingerprintsViaColumns(spark, dir)
      .as[(Long, String, String, String)].collect().toSeq
    assert(fast == ref)
  }

  test("shingle_hashes equals distinct md5-prefix hashes of the Column shingle pipeline") {
    import org.apache.spark.sql.functions._
    graft.functions.SearchExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
    val native = docs
      .select(col("doc_id"),
        call_function("shingle_hashes", col("tokens"), lit(5)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaColumns = docs
      .select(col("doc_id"),
        array_sort(array_distinct(transform(Dedup.shingles(col("tokens"), 5),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == viaColumns.keySet)
    native.foreach { case (id, hs) =>
      assert(hs == viaColumns(id), s"doc $id")
      assert(hs == hs.sorted && hs.distinct == hs, s"doc $id not sorted-distinct")
    }
    // short docs (< n tokens) yield an empty array, not null
    val short = Seq((1L, Seq("a", "b"))).toDF("doc_id", "tokens")
      .select(call_function("shingle_hashes", col("tokens"), lit(5)).as("hs"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }

  test("shingle_strings equals the Column shingle pipeline, first-occurrence order") {
    import org.apache.spark.sql.functions._
    graft.functions.SearchExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
    for (n <- Seq(3, 5)) {
      val native = docs
        .select(col("doc_id"),
          call_function("shingle_strings", col("tokens"), lit(n)).as("ss"))
        .as[(Long, Seq[String])].collect().toMap
      val viaColumns = docs
        .select(col("doc_id"), Dedup.shingles(col("tokens"), n).as("ss"))
        .as[(Long, Seq[String])].collect().toMap
      assert(native.keySet == viaColumns.keySet)
      native.foreach { case (id, ss) => assert(ss == viaColumns(id), s"doc $id n=$n") }
    }
    // short docs (< n tokens) yield an empty array, not null
    val short = Seq((1L, Seq("a", "b"))).toDF("doc_id", "tokens")
      .select(call_function("shingle_strings", col("tokens"), lit(5)).as("ss"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("winnow_hashes selection digests to winnow_fingerprint's fp") {
    import org.apache.spark.sql.functions._
    graft.functions.SearchExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
    val both = docs.select(col("doc_id"),
        call_function("winnow_hashes", col("tokens"), lit(5), lit(4)).as("sel"),
        call_function("winnow_fingerprint", col("tokens"), lit(5), lit(4)).as("wf"))
      .select(col("sel"), col("wf.n_selected").as("n"), col("wf.fp_winnow").as("fp"))
      .as[(Seq[Long], Int, String)].collect()
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    both.foreach { case (sel, n, fp) =>
      assert(sel.length == n)
      assert(sel == sel.sorted && sel.distinct == sel)
      assert(m(sel.mkString(",")) == fp)
    }
  }

  test("winnowPairs finds the exact duplicate pair and respects the hash-df cap") {
    val dir2 = java.nio.file.Files.createTempDirectory("winnowpairs").toString
    val docs = (0 until 12).map(i =>
      (i.toLong, s"b1 b2 b3 b4 b5 u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
      Seq((100L, "r1 r2 r3 r4 r5 r6 r7 r8"), (101L, "r1 r2 r3 r4 r5 r6 r7 r8"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir2/documents.parquet")
    try {
      // uncapped at a floor threshold: the boilerplate minimum shared
      // by a handful of docs produces junk pairs alongside the real one
      val loose = Dedup.winnowPairs(spark, dir2, threshold = 0.01, maxHashDf = 100)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(loose.exists(r => r._1 == 100L && r._2 == 101L && r._4 == 1.0), loose)
      assert(loose.length > 1, "expected boilerplate junk pairs without the cap")
      // cap below the boilerplate hash's df: only the exact dup remains
      val capped = Dedup.winnowPairs(spark, dir2, threshold = 0.01, maxHashDf = 3)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(capped.map(r => (r._1, r._2)) == Seq((100L, 101L)), capped)
      assert(capped.head._4 == 1.0, "exact dup must have full winnow-set overlap")
    } finally Dedup.clearCaches()
  }

  test("repetitionSignals native expression equals the shuffle pipeline") {
    val fast = TextAnalysis.repetitionSignals(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val ref = TextAnalysis.repetitionSignalsViaShuffle(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(fast == ref)
  }

  test("keywordsTfidf: ranks bounded, scores descending, spot-check vs driver recount") {
    import org.apache.spark.sql.functions._
    val out = Curation.keywordsTfidf(spark, dir).as[(Long, Long, String, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, r, _, _) => r >= 1 && r <= 3 })
    out.groupBy(_._1).foreach { case (id, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq, s"doc $id rank gap")
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-(_: Double)).toSeq,
        s"doc $id scores not descending")
    }
    // driver-side recount for one doc: top term by tf*ln(N/df)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .as[(Long, Seq[String])].collect()
    val n = toks.length.toDouble
    val df = toks.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .view.mapValues(_.length).toMap
    val (id0, ts0) = toks.find(_._2.nonEmpty).get
    val best = ts0.groupBy(identity).view.mapValues(_.length).toSeq
      .map { case (t, tf) =>
        (t, tf * BigDecimal(math.log(n / df(t))).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }
      .sortBy { case (t, s) => (-s, t) }.head._1
    assert(out.filter(r => r._1 == id0 && r._2 == 1L).head._3 == best)
  }

  test("sourceOverlap: symmetric-free pair matrix with plausible bounds") {
    import org.apache.spark.sql.functions._
    val out = Curation.sourceOverlap(spark, dir).as[(String, String, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, n) => a < b && n > 0 })
    assert(out.map { case (a, b, _) => (a, b) }.distinct.length == out.length)
    // each pair's shared-gram count can't exceed the smaller source's
    // distinct gram count
    val perSource = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        explode(org.apache.spark.sql.functions.call_function("shingle_hashes",
          graft.analysis.Analyzers.default.tokensCol(col("text")), lit(5))).as("g"))
      .distinct().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    out.foreach { case (a, b, n) =>
      assert(n <= math.min(perSource(a), perSource(b)), s"pair ($a,$b)")
    }
  }

  test("sourceOverlap gram cap drops hot grams from the pair counts") {
    val uncapped = Curation.sourceOverlap(spark, dir)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // cap at 2 sources: any gram in 3+ sources stops contributing, so
    // every pair count can only shrink (or the pair disappears)
    val capped = Curation.sourceOverlap(spark, dir, maxGramSources = 2)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.keySet.subsetOf(uncapped.keySet))
    assert(capped.forall { case (k, v) => v <= uncapped(k) })
    assert(capped.values.sum < uncapped.values.sum, "cap removed nothing at k=2")
  }

  test("unigramLogprob: positive scores, spot-check one doc against driver recount") {
    import org.apache.spark.sql.functions._
    val out = Curation.unigramLogprob(spark, dir).as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, nTok, s) => nTok > 0 && s > 0.0 })
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .as[(Long, Seq[String])].collect()
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = cnt.values.sum.toDouble
    val (id0, ts0) = toks.find(_._2.nonEmpty).get
    val expect = ts0.map(t =>
        BigDecimal(-math.log(cnt(t) / total)).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / ts0.length
    val got = out.find(_._1 == id0).get._3
    assert(math.abs(got - expect) < 5e-4, s"doc $id0: $got vs $expect")
  }

  test("bigramLogprob equals a full driver recount on every doc") {
    import org.apache.spark.sql.functions._
    val out = Curation.bigramLogprob(spark, dir).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .as[(Long, Seq[String])].collect()
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bcnt = toks.flatMap(_._2.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val v = cnt.size.toLong
    val total = cnt.values.sum.toDouble
    def dec(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    toks.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val first = dec(-math.log(cnt(ts.head) / total))
      val rest = ts.sliding(2).filter(_.length == 2).map { p =>
        dec(-math.log((bcnt(p) + 1.0) / (cnt(p.head) + v)))
      }
      val lpSum = (Iterator(first) ++ rest).reduce(_ + _)
      val expect = math.rint(lpSum.toDouble / ts.length * 1e4) / 1e4
      val (nTok, got) = out(id)
      assert(nTok == ts.length, s"doc $id n_tokens")
      assert(got == expect, s"doc $id: $got vs $expect")
    }
  }

  test("qualityClassifier: deterministic fit that beats the majority baseline") {
    val out = Curation.qualityClassifier(spark, dir).as[(Long, Long, Double)].collect().toSeq
    val out2 = Curation.qualityClassifier(spark, dir).as[(Long, Long, Double)].collect().toSeq
    assert(out == out2, "decimal-summed moments must make the fit run-deterministic")
    assert(out.forall { case (_, y, s) => (y == 0L || y == 1L) && s >= 0.0 && s <= 1.0 })
    val n = out.length
    val acc = out.count { case (_, y, s) => (if (s >= 0.5) 1L else 0L) == y }.toDouble / n
    val majority = math.max(out.count(_._2 == 1L), out.count(_._2 == 0L)).toDouble / n
    assert(acc > majority,
      s"classifier accuracy $acc must beat the majority-class baseline $majority")
  }

  test("mixWeights: shares sum to 1, rates cap at 1 and downsample the over-represented") {
    val out = Curation.mixWeights(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
    assert(out.forall(r => r._5 > 0.0 && r._5 <= 1.0))
    val target = 1.0 / out.length
    out.foreach { case (s, _, _, share, rate) =>
      if (share > target * 1.001) assert(rate < 1.0, s"$s over target but uncapped")
      // a source at or under target keeps everything
      if (share <= target) assert(rate == 1.0, s"$s under target but downsampled: $rate")
      // the rate hits the target share: share * rate == target (when capped)
      if (rate < 1.0) assert(math.abs(share * rate - target) < 1e-4)
    }
  }

  test("domainMixture: empty corpus yields an empty frame, not an NPE") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_empty_corpus").toString
    spark.read.parquet(s"$dir/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Curation.domainMixture(spark, tmp).count() == 0)
  }

  test("domainMixture: temperature interpolates between natural and uniform") {
    val out = Curation.domainMixture(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    // weights are a distribution
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
    assert(out.forall(_._4 > 0.0))
    // α=0.7 compresses toward uniform: every domain's weight sits
    // strictly between its natural share and the uniform share
    // (unless the two coincide)
    val total = out.map(_._3).sum.toDouble
    val uniform = 1.0 / out.length
    out.foreach { case (s, _, nTok, w, epochs) =>
      val natural = nTok / total
      if (math.abs(natural - uniform) > 1e-9) {
        val lo = math.min(natural, uniform) - 1e-6
        val hi = math.max(natural, uniform) + 1e-6
        assert(w > lo && w < hi, s"$s: weight $w outside ($natural, $uniform)")
      }
      // epochs_at_budget = weight * total / n_tokens (4dp)
      assert(math.abs(epochs - w * total / nTok) < 2e-3, s"$s epochs")
      // small domains repeat (epochs > 1), large ones are subsampled
      if (natural < uniform * 0.999) assert(epochs > 1.0, s"$s should repeat")
      if (natural > uniform * 1.001) assert(epochs < 1.0, s"$s should subsample")
    }
    // α is honored: α=1 reproduces the natural shares exactly
    val nat = Curation.domainMixture(spark, dir, alpha = 1.0)
      .as[(String, Long, Long, Double, Double)].collect()
    nat.foreach { case (s, _, nTok, w, _) =>
      assert(math.abs(w - nTok / total) < 1e-5, s"$s: α=1 weight drifted")
    }
  }

  test("piiScrubLive: enrichment fires every pattern with id-determined counts") {
    val out = Curation.piiScrubLive(spark, dir)
      .as[(Long, Long, Long, Long, String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nEmail, nIp, nPhone, fp, _) =>
      assert(nEmail == (if (id % 2 == 0) 2L else 1L), s"doc $id emails")
      assert(nIp == 1L, s"doc $id ips")
      assert(nPhone == (if (id % 5 == 0) 0L else 1L), s"doc $id phones")
      assert(fp.nonEmpty)
    }
    // the redaction actually rewrote the text: live fingerprints
    // differ from the plain entry's raw-content hashes
    val plain = Curation.piiScrub(spark, dir)
      .as[(Long, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(out.forall(r => plain(r._1) != r._5))
  }

  test("ccnetBuckets: per-lang buckets are ordered, exhaustive and roughly balanced") {
    import org.apache.spark.sql.functions._
    val out = Curation.ccnetBuckets(spark, dir)
      .as[(Long, String, Double, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("head", "middle", "tail").contains(r._4)))
    // every scored doc is bucketed (threshold join drops nothing at
    // this SF — all languages appear in the md5 sample)
    assert(out.length == Curation.unigramLogprob(spark, dir).count())
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // bucket boundaries are strict: a head score can never exceed a
      // middle score of the same language, nor middle exceed tail
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max < m.min, s"$lang: head/middle overlap")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max < t.min, s"$lang: middle/tail overlap")
      // sample-fitted terciles are approximate by design (a ~14-doc
      // sample for the smallest sf0.001 language): assert sanity, not
      // exact thirds — every bucket present with a non-degenerate
      // share
      assert(byBucket.keySet == Set("head", "middle", "tail"), s"$lang buckets")
      val n = rows.length.toDouble
      byBucket.foreach { case (b, ss) =>
        val frac = ss.length / n
        assert(frac > 0.03 && frac < 0.85, s"$lang/$b fraction $frac")
      }
    }
  }

  test("piiScrub: detects and redacts PII-shaped spans; corpus entry runs clean") {
    import org.apache.spark.sql.functions._
    // synthetic fixtures exercise the patterns the corpus lacks
    val fixtures = Seq(
      (1L, "contact alice.smith+x@example.co.uk or bob@test.io today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call +1 555-123-4567 or 02-1234-5678 now"),
      (4L, "no pii here at all"),
      (5L, "mix: a@b.de from 8.8.8.8 dials 0123456789"))
    val dirTmp = java.nio.file.Files.createTempDirectory("pii").toString
    fixtures.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dirTmp/documents.parquet")
    val out = Curation.piiScrub(spark, dirTmp)
      .as[(Long, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 2 && out(1L)._3 == 0 && out(1L)._4 == 0) // two emails
    assert(out(2L)._3 == 2) // two IPs
    assert(out(3L)._4 >= 2) // two phone-shaped runs
    assert(out(4L)._2 == 0 && out(4L)._3 == 0 && out(4L)._4 == 0)
    assert(out(5L)._2 == 1 && out(5L)._3 == 1 && out(5L)._4 >= 1)
    // a clean doc's fingerprint is the plain content hash; a dirty
    // doc's differs and its redaction shrinks or reshapes the text
    val cleanFp = spark.sql("SELECT md5('no pii here at all')").head().getString(0)
    assert(out(4L)._5 == cleanFp)
    assert(out(1L)._5 != cleanFp)
    // corpus entry: single scan, deterministic, and (synthetic corpus)
    // finds nothing — fingerprint equals the raw content hash
    val corpus = Curation.piiScrub(spark, dir)
      .as[(Long, Long, Long, Long, String, Long)].collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(r => r._2 == 0 && r._3 == 0))
  }

  test("vocabCoverage: oov fraction consistent with a driver-side recount") {
    import org.apache.spark.sql.functions._
    val out = Curation.vocabCoverage(spark, dir).as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // recompute the top-20 df vocabulary on the driver and respot 5 docs
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .as[(Long, Seq[String])].collect()
    val df = toks.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .view.mapValues(_.length).toSeq
    val vocab = df.sortBy { case (t, d) => (-d, t) }.take(20).map(_._1).toSet
    val byId = toks.toMap
    out.take(5).foreach { case (id, nTok, nOov, frac) =>
      val ts = byId(id)
      assert(nTok == ts.length)
      val oov = ts.count(t => !vocab.contains(t))
      assert(nOov == oov, s"doc $id: oov $oov vs $nOov")
      assert(math.abs(frac - oov.toDouble / math.max(ts.length, 1)) < 1e-3)
    }
  }

  test("splitAssign: deterministic, source-coherent, covers the corpus") {
    val a = Curation.splitAssign(spark, dir).as[(Long, String, String)].collect()
    val b = Curation.splitAssign(spark, dir).as[(Long, String, String)].collect()
    assert(a.toSeq == b.toSeq, "split assignment must be deterministic")
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(a.length == total, "every document gets a split")
    assert(a.map(_._3).toSet.subsetOf(Set("train", "validation", "test")))
    // the leakage guard: a source never straddles splits
    a.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).toSet.size == 1, s"source $src straddles splits")
    }
  }

  test("curateManifest: dedup-keep, gates and split agree with the component operators") {
    import org.apache.spark.sql.functions._
    val m = Curation.curateManifest(spark, dir)
      .as[(Long, String, String, Long, Double)].collect()
    assert(m.nonEmpty)
    // survivors are exactly the exact-dedup canonicals passing gates
    val canon = Dedup.exact(spark, dir).where(col("doc_id") === col("canonical_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(m.forall(r => canon.contains(r._1)), "non-canonical doc in manifest")
    m.foreach { case (_, _, _, n, q) => assert(n >= 16 && q >= 0.05) }
    // split labels match the standalone assignment
    val splits = Curation.splitAssign(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    m.foreach { case (id, _, s, _, _) => assert(s == splits(id), s"doc $id split") }
    // no canonical doc passing the gates is missing
    val gated = graft.streaming.EventStreams
      .curateStream(spark.read.parquet(s"$dir/documents.parquet"))
      .select("doc_id").as[Long].collect().toSet
    assert(m.map(_._1).toSet == (canon intersect gated), "manifest = canonicals ∩ gate-passers")
  }

  test("chunkDocuments: windows tile the token stream with the stated overlap") {
    import org.apache.spark.sql.functions._
    val window = 32; val stride = 24
    val chunks = Curation.chunkDocuments(spark, dir, window, stride)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.analysis.Analyzers.default.tokensCol(col("text")).as("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.keySet == toks.keySet, "every document is chunked")
    toks.foreach { case (id, ts) =>
      val cs = chunks(id)
      val expected = ((math.max(ts.length, 1) - 1) / stride) + 1
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks vs $expected")
      cs.foreach { case (_, idx, n, text) =>
        val start = idx.toInt * stride
        val want = ts.slice(start, start + window)
        assert(n == want.length, s"doc $id chunk $idx length")
        assert(text == want.mkString(" "), s"doc $id chunk $idx content")
      }
    }
  }
}
