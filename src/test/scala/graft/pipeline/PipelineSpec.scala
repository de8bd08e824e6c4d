package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles produce distinct contiguous n-grams") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x"), Seq.empty[String]).toDF("tokens")
    val got = df.select(Dedup.shingles(col("tokens"), 3).as("s")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Nil)
    assert(got(2) == Nil)
  }

  test("substringSpans merges overlapping windows into maximal spans") {
    val dir = java.nio.file.Files.createTempDirectory("subspan").toString
    // shared = a 10-token run duplicated across docs 1 and 2 at
    // different offsets; with k=8 it flags windows at 3 consecutive
    // starts that must merge into ONE 10-token span. doc 3 repeats an
    // 8-token run internally (two flagged windows, disjoint -> two
    // spans of 8). doc 4 is all-unique (zero spans).
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1a u1b $shared u1c u1d u1e"),
      (2L, s"$shared u2a u2b u2c u2d u2e"),
      (3L, s"$rep u3a u3b $rep"),
      (4L, (0 until 30).map(i => s"q$i").mkString(" ")))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    try {
      val got = Dedup.substringSpans(spark, dir)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq(
        (1L, 15L, 1L, 10L, 0.6667),
        (2L, 15L, 1L, 10L, 0.6667),
        (3L, 18L, 2L, 16L, 0.8889),
        (4L, 30L, 0L, 0L, 0.0)))
      // the transform strips exactly those spans, keeping the rest in order
      def m(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val kept = Dedup.stripDuplicatedSpans(spark, dir)
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(kept == Seq(
        (1L, 15L, 5L, m("u1a u1b u1c u1d u1e")),
        (2L, 15L, 5L, m("u2a u2b u2c u2d u2e")),
        (3L, 18L, 2L, m("u3a u3b")),
        (4L, 30L, 30L, m((0 until 30).map(i => s"q$i").mkString(" ")))))
    } finally Dedup.clearCaches()
  }

  test("substringSpans and strip match a brute-force reference on random corpora") {
    val k = 8
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // shared phrases force cross-doc window collisions; noise tokens
      // are doc-unique so only engineered repeats collide
      val phrases = Vector.tabulate(3)(p =>
        Vector.tabulate(10)(i => s"p${p}w$i"))
      val docs = (0 until 25).map { d =>
        val parts = Vector.fill(rnd.nextInt(4)) {
          if (rnd.nextBoolean()) phrases(rnd.nextInt(3))
          else Vector.tabulate(3 + rnd.nextInt(10))(i => s"d${d}n${rnd.nextInt(1000)}i$i")
        }
        (d.toLong, parts.flatten.mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"subfuzz$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      try {
        // brute force: window-string multiset over the corpus
        val toksOf = docs.map { case (id, t) =>
          id -> t.split(" ").filter(_.nonEmpty).toVector
        }.toMap
        val counts = toksOf.values.flatMap(_.sliding(k).filter(_.length == k))
          .groupBy(identity).view.mapValues(_.size).toMap
        val expect = docs.map { case (id, _) =>
          val ts = toksOf(id)
          val flagged = ts.sliding(k).zipWithIndex
            .collect { case (w, i) if w.length == k && counts(w) > 1 => i }.toVector
          // interval islands
          val spans = flagged.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
            acc.lastOption match {
              case Some((s, e)) if p <= e => acc.init :+ (s, p + k)
              case _ => acc :+ (p, p + k)
            }
          }
          val dupTok = spans.map { case (s, e) => e - s }.sum
          val frac = if (ts.isEmpty) 0.0 else math.rint(dupTok.toDouble / ts.length * 1e4) / 1e4
          (id, ts.length.toLong, spans.length.toLong, dupTok.toLong, frac)
        }
        val got = Dedup.substringSpans(spark, dir)
          .as[(Long, Long, Long, Long, Double)].collect().toSeq
        assert(got == expect, s"seed $seed")
        // strip agrees: kept = tokens outside every span
        val expectKept = docs.map { case (id, _) =>
          val ts = toksOf(id)
          val flagged = ts.sliding(k).zipWithIndex
            .collect { case (w, i) if w.length == k && counts(w) > 1 => i }.toSet
          val drop = flagged.flatMap(p => p until p + k)
          val kept = ts.zipWithIndex.collect { case (t, i) if !drop(i) => t }
          def m(s: String) = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, ts.length.toLong, kept.length.toLong, m(kept.mkString(" ")))
        }
        val gotKept = Dedup.stripDuplicatedSpans(spark, dir)
          .as[(Long, Long, Long, String)].collect().toSeq
        assert(gotKept == expectKept, s"seed $seed strip")
      } finally Dedup.clearCaches()
    }
  }

  test("substringSpans is non-vacuous on the synthetic corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.substringSpans(spark, dir)
      .agg(sum(when(col("n_dup_spans") > 0, 1).otherwise(0)).as("docs_with_spans"),
        max(col("dup_frac")).as("max_frac"))
      .as[(Long, Double)].head()
    assert(out._1 > 0, "expected at least one doc with a duplicated span")
    assert(out._2 <= 1.0)
  }

  test("ngramJaccard hot-shingle cap bounds boilerplate candidates") {
    val dir = java.nio.file.Files.createTempDirectory("ngramcap").toString
    // 12 docs sharing ONE boilerplate shingle (plus unique filler) and
    // one genuinely duplicated pair of rare docs
    val docs = (0 until 12).map(i =>
      (i.toLong, s"b1 b2 b3 b4 b5 u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
      Seq((100L, "r1 r2 r3 r4 r5 r6"), (101L, "r1 r2 r3 r4 r5 r6"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    try {
      // without the cap every boilerplate pair is a candidate AND
      // passes a low verify threshold: 66 junk pairs + the real one
      val uncapped = Dedup.ngramJaccard(spark, dir, threshold = 0.01,
        maxShingleDf = 1000).count()
      assert(uncapped == 12L * 11 / 2 + 1)
      // with the cap (df(b1..b5) = 12 > 10) only the real pair remains
      val capped = Dedup.ngramJaccard(spark, dir, threshold = 0.01, maxShingleDf = 10)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(capped == Set((100L, 101L)))
    } finally Dedup.clearCaches()
  }

  test("hot-bucket escape: boilerplate buckets stay bounded, no missed near-dups") {
    val dir = java.nio.file.Files.createTempDirectory("hotbucket").toString
    // degenerate boilerplate bucket: 20 IDENTICAL docs share every
    // band hash — far over cap=4 as raw members, ONE row as a
    // deduped shingle profile. Plus one duplicated pair and one
    // genuinely unique doc (the self-exclusion probe).
    val boiler = "alpha beta gamma delta epsilon zeta eta"
    val pairTx = "theta iota kappa lambda mu nu xi"
    val unique = "omicron pi rho sigma tau upsilon phi"
    val docs = (0L until 20L).map(i => (i, boiler)) ++
      Seq((100L, pairTx), (101L, pairTx), (200L, unique))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    try {
      val cands = Dedup.corpusBandCandidates(spark, dir, cap = 4)
      // bounded: no bucket row exceeds the cap — 20 identical docs
      // collapse to one profile group carrying (min id, count)
      val sizes = cands.select(size(col("cands")).as("n"))
        .as[Int].collect()
      assert(sizes.nonEmpty && sizes.forall(_ <= 4), sizes.mkString(","))
      val boilerGroup = cands
        .select(explode(col("cands")).as("c")).select("c.corpus_id", "c.cnt")
        .where(col("cnt") === 20).distinct().as[(Long, Long)].collect()
      assert(boilerGroup.toSeq == Seq((0L, 20L)),
        s"boilerplate profile not collapsed: ${boilerGroup.mkString(",")}")
      // no missed near-dups + correct self-exclusion: probe every doc
      // through the SAME per-band join + verify the ingest DAG runs
      val probes = Dedup.withBandColumns(
        docs.toDF("doc_id", "text"),
        graft.analysis.Analyzers.default.tokensCol(col("text")))
      val joined = (0 until 4).foldLeft(probes)((acc, b) =>
        acc.join(
          cands.where(col("band") === b)
            .select(col("bh").as(s"bh_$b"), col("cands").as(s"__cands_$b")),
          Seq(s"bh_$b"), "left"))
      val flag = (0 until 4).map(b =>
        Dedup.profileMatchExpr(col(s"__cands_$b"), col("ss"),
          col("doc_id"), 0.6)).reduce(_ || _)
      val got = joined.select(col("doc_id"), flag.as("dup"))
        .as[(Long, Boolean)].collect().toMap
      // every boilerplate doc flags (even the ones an id-sorted raw
      // cap would have truncated), the pair flags, the unique doesn't
      (0L until 20L).foreach(i => assert(got(i), s"missed near-dup $i"))
      assert(got(100L) && got(101L), "duplicated pair missed")
      assert(!got(200L), "unique doc must not match itself")
    } finally Dedup.clearCaches()
  }

  test("resolveClusters: transitive groups collapse to the min id") {
    // two components — a 6-node CHAIN (diameter 5, forces several
    // propagation rounds) and a 2-node pair — plus untouched node ids
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (7L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.resolveClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert((10L to 15L).forall(got(_) == 10L))
    assert(got(3L) == 3L && got(7L) == 3L)
    assert(got.size == 8) // singletons don't appear
    // keep-one: canonical survivors + docs outside any pair
    val corpus = (1L to 16L).toDF("doc_id")
    val kept = Dedup.dropClusteredDuplicates(corpus,
      Dedup.resolveClusters(pairs), "doc_id").as[Long].collect().toSet
    assert(kept == (1L to 16L).toSet -- Set(11L, 12L, 13L, 14L, 15L, 7L))
    // empty pair set: no clusters, nothing dropped
    val none = Dedup.resolveClusters(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(none.count() == 0)
    // 60-node chain (diameter 59): pointer jumping must converge well
    // inside the default 20-round bound
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cgot = Dedup.resolveClusters(chain).as[(Long, Long)].collect().toMap
    assert(cgot.size == 60 && cgot.values.forall(_ == 0L))
  }

  test("repetition signals: line dups and n-gram loops are caught") {
    val dir = java.nio.file.Files.createTempDirectory("repsig").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // no repetition
      (2L, "spam ham spam ham spam ham spam ham spam ham"),  // 2-gram loop
      (3L, "line one\nline two\nline one\nline three"))      // one dup line of 4
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.repetitionSignals(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(2) == 0.0)                      // dup_line_frac
    assert(got(1L).getDouble(4) == 0.0)                      // dup_5gram_frac
    // doc 2: 44 chars; top 2-gram "spam ham" x5 covers 40 chars; both
    // 5-gram values repeat 3x (22 + 21 chars) -> 129/44 = 2.9318, the
    // >1 degenerate-loop reading the scaladoc documents
    assert(got(2L).getDouble(3) == 0.9091)                   // top_2gram_frac
    assert(got(2L).getDouble(4) == 2.9318)
    assert(got(3L).getLong(1) == 4L)                         // n_lines
    assert(got(3L).getDouble(2) == 0.25)
  }

  test("repetition signals: supplementary-plane chars match the shuffle reference") {
    // emoji are 2 UTF-16 units but 1 code point: String.length-based
    // char counts and String.compareTo tie-breaks would desync from
    // Spark length()/binary string ordering here (ADVICE r6)
    val dir = java.nio.file.Files.createTempDirectory("repsup").toString
    Seq(
      (1L, "😀a b 😀a b 😀a b filler one two"), // emoji 2-gram loop
      // 2-grams "😀 x" / "！ x" tie at count 2 and code-point length
      // 3, but order OPPOSITELY under UTF-16 code units (surrogate
      // 0xD83D < 0xFF01) vs code points (U+1F600 > U+FF01) — the tie
      // winner and its char count both hinge on the fixed comparison
      (2L, "😀 x 😀 x ！ x ！ x pad"),
      (3L, "plain words with no repeats at all"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val native = TextAnalysis.repetitionSignals(spark, dir).collect().map(_.toSeq)
    val ref = TextAnalysis.repetitionSignalsViaShuffle(spark, dir).collect().map(_.toSeq)
    assert(native.toSeq == ref.toSeq)
  }

  test("cosine similarity of identical vectors is 1") {
    graft.functions.SearchExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0), Seq(-1.0, -2.0, -3.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("opp")).as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12)
    assert(math.abs(r._2 + 1.0) < 1e-12)
  }

  test("hyperplanes are deterministic") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -0.5 && v < 0.5))
  }

  test("embeddingPairsLsh is non-vacuous: planted near-dups are found") {
    // the driver corpus yields 0 pairs at small SFs (a green 0-row
    // entry proves schema, not behavior) — plant true near-dups and
    // assert the LSH-blocked path emits them
    val dim = 64
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Double] = Seq.fill(dim)(rnd.nextGaussian())
    val base = vec()
    val nearDup = base.zipWithIndex.map { case (v, i) =>
      if (i == 0) v + 1e-3 else v } // cosine ~ 1, same sign pattern
    val rows = Seq(
      (100L, base, "x"), (101L, nearDup, "x"),
      (200L, base.map(-_), "x")) ++ // antipode: same |cos| but negative — must NOT pair
      (0L until 20L).map(i => (i, vec(), "x"))
    val dir = java.nio.file.Files.createTempDirectory("emblsh").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    try {
      val pairs = Dedup.embeddingPairsLsh(spark, dir, threshold = 0.95)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((100L, 101L)), s"planted near-dup not found: $pairs")
      assert(!pairs.exists(p => p._1 == 200L || p._2 == 200L),
        s"antipodal vector must not pair: $pairs")
    } finally Dedup.clearCaches()
  }

  test("crossDecontaminate flags planted eval near-dups, train-only output") {
    // 20 is eval (20 % 20 == 0); 21 is a train near-copy with a
    // DIFFERENT text but the IDENTICAL 3-shingle set (a period-3
    // repeat extended by one period — fuzzy-identical, Jaccard 1.0,
    // so every LSH band collides BY CONSTRUCTION; a partial-overlap
    // plant can deterministically miss all 4 bands); 22 is unrelated
    // train
    val evalText = "alpha beta gamma alpha beta gamma alpha beta"
    val nearCopy = "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta"
    val rows = Seq(
      (20L, evalText), (21L, nearCopy), (22L, "one two three four five six seven")) ++
      (1L to 15L).map(i => (i, s"filler$i word$i text$i more$i tokens$i"))
    val dir = java.nio.file.Files.createTempDirectory("xdecont").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    try {
      val out = Dedup.crossDecontaminate(spark, dir, threshold = 0.5)
        .as[(Long, Long, Double, Long)].collect()
      assert(out.forall(_._1 % 20 != 0), "output must be train docs only")
      assert(out.forall(_._4 % 20 == 0), "witness must be an eval doc")
      assert(out.forall(r => r._3 >= 0.5 && r._3 <= 1.0))
      val hit = out.find(_._1 == 21L)
      assert(hit.isDefined, s"planted near-copy of eval doc not flagged: ${out.toSeq}")
      assert(hit.get._4 == 20L)
      assert(!out.exists(_._1 == 22L), "unrelated train doc must not be flagged")
    } finally Dedup.clearCaches()
  }

  test("multimodal stub decode is deterministic and length-derived") {
    val (n, w, h, f) = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    assert(n == 11L && w == 11L && h == 77L && f == 12L)
  }

  test("image decode reads real PNG/BMP headers; garbage falls back to stub") {
    // PNG round-trip: dimensions from actual bytes
    val png = Multimodal.syntheticPng(17, 9)
    assert(Multimodal.imageDecode(png) == Some((17L, 9L, "png")))
    // a second JDK codec (BMP) through the same dispatch
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    assert(Multimodal.imageDecode(out.toByteArray) == Some((5L, 3L, "bmp")))
    // non-image bytes: no reader claims them → deterministic stub
    val junk = "hello world".getBytes("UTF-8")
    assert(Multimodal.imageDecode(junk).isEmpty)
    assert(Multimodal.decode(junk) == ((11L, 11L, 77L, 12L, "raw")))
    // truncated PNG header: recognized prefix but unreadable → stub,
    // not a task failure
    assert(Multimodal.decode(png.take(12)) ne null)
  }

  test("winnowing: shared long runs intersect, short docs still fingerprint") {
    val common = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val docs = Seq(
      (1L, s"intro words here $common"),
      (2L, s"$common and a completely different tail of text"),
      (3L, "tiny doc"), // < n tokens → empty selection
      (4L, "six distinct tokens right here now") // >= n but < n+w-1
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = TextAnalysis.winnowing(spark, dir)
      .select("doc_id", "n_selected").as[(Long, Int)].collect().toMap
    assert(fp(3L) == 0) // no shingles at all
    assert(fp(4L) > 0) // shorter than one window: every hash selected
    // overlap guarantee: docs 1 and 2 share an 11-token run >= n+w-1=8,
    // so their selected-hash SETS must intersect — check via the
    // underlying selection rather than the digest
    val sel = docs.where($"doc_id" <= 2)
      .select($"doc_id", graft.analysis.Analyzers.default.tokensCol($"text").as("tokens"))
      .withColumn("ss", transform(sequence(lit(1), size($"tokens") - 4),
        i => concat_ws(" ", (0 until 5).map(o => element_at($"tokens", i + o)): _*)))
      .withColumn("hs", transform($"ss", s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
      .withColumn("m", transform(sequence(lit(1), size($"hs") - 3), i => array_min(slice($"hs", i, lit(4)))))
      .select($"doc_id", array_distinct($"m").as("sel"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sel(1L).toSet.intersect(sel(2L).toSet).nonEmpty)
  }

  test("stub features are a normalized byte histogram feeding Similarity") {
    val f = Multimodal.stubFeatures("aabc".getBytes("UTF-8"))
    assert(f.length == Multimodal.featureDim)
    assert(math.abs(f(0) - 0.5) < 1e-12 && math.abs(f(1) - 0.25) < 1e-12)
    assert(Multimodal.stubFeatures(Array.emptyByteArray).forall(_ == 0.0))
    // extracted features compose with the similarity operators
    graft.functions.SearchExpressions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("mmfeat").toString
    Seq((1L, "aaab"), (2L, "aaba"), (3L, "zzzz"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val feats = Multimodal.featureExtract(spark, dir)
    val nonZero = feats.where(col("doc_id") < 3L)
    val pairs = nonZero.as("x").crossJoin(nonZero.as("y"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        Similarity.cosine(col("x.features"), col("y.features")).as("cos"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12) // same histogram
    // 'z' is outside the histogram range → zero vector
    val z = feats.where(col("doc_id") === 3L).select("features").as[Seq[Double]].head()
    assert(z.forall(_ == 0.0))
  }

  test("resize planning preserves aspect and never upscales") {
    val dir = java.nio.file.Files.createTempDirectory("mmresize").toString
    // strlen 300 -> w=300, h=2100%480=180; strlen 100 -> w=100 h=220
    Seq((1L, "x" * 300), (2L, "y" * 100))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.resizeMeta(spark, dir)
      .select("doc_id", "width", "height", "out_w", "out_h")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val (_, w1, h1, ow1, oh1) = got(1L)
    assert(w1 == 300 && h1 == 180 && ow1 == 224 && oh1 == 134) // scale 224/300
    val (_, w2, h2, ow2, oh2) = got(2L)
    assert(w2 == 100 && h2 == 220 && ow2 == 100 && oh2 == 220) // no upscale
  }

  test("int8 quantization: codes bounded, reconstruction within half-step, recall holds") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val q8 = Similarity.quantizeInt8(spark, dir)
      .select(col("vec_id"), col("scale_r"), col("q"), col("max_abs_err"))
      .as[(Long, Double, Seq[Int], Double)].collect()
    assert(q8.nonEmpty)
    q8.foreach { case (id, scale, codes, err) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      // half-even rounding keeps each coordinate within half a step
      // (plus the rounding slack on the reported scale)
      assert(err <= scale / 2 + 1e-6, s"vec $id err $err > ${scale / 2}")
    }
    // retrieval survives quantization — measured as containment in the
    // exact HEAD, not exact top-10 overlap: the synthetic corpus packs
    // dozens of candidates within ~0.01 cosine of the k-boundary, and
    // int8 noise (~0.5/127 per coordinate) legitimately reorders those
    // near-ties. The invariant that holds (and matters) is that every
    // quantized top-10 hit is a true top-30 candidate.
    val exactHead = Similarity.bruteForce(spark, dir, k = 30)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(spark, dir)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet == exactHead.keySet)
    // keys is a Set — map to a Seq first or equal ratios collapse
    val contained = exactHead.keys.toSeq.map { q =>
      (exactHead(q) & quant(q)).size.toDouble / quant(q).size
    }.sum / exactHead.size
    assert(contained >= 0.9, s"int8 top-10-in-exact-top-30 $contained below 0.9")
  }

  test("multi-probe LSH recalls at least as much as single-bucket LSH") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = hits(Similarity.bruteForce(spark, dir, k = 5))
    val single = hits(Similarity.lshTopK(spark, dir))
    val multi = hits(Similarity.lshMultiProbeTopK(spark, dir))
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq.map { q =>
        (exact(q) & got.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
      }.sum / exact.size
    val (rs, rm) = (recall(single), recall(multi))
    assert(rm >= rs, s"multi-probe recall $rm < single-bucket $rs")
    // probing 9 buckets instead of 1 must surface strictly more
    // candidates on this corpus (each query fills its k)
    assert(multi.values.map(_.size).sum > single.values.map(_.size).sum)
  }

  test("filteredTopK: label constraint enforced, equals label-restricted brute force") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val got = Similarity.filteredTopK(spark, dir)
      .select("qid", "rank", "vec_id", "cos").as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, _, v, _) =>
      assert(labels(v) == labels(q), s"hit $v label != query $q label")
      assert(v != q, "self hit")
    }
    // equals the unfiltered brute-force ranking restricted to the
    // label (k = full corpus so no same-label candidate is truncated;
    // compare sets at rank k to dodge near-tie ordering)
    val exact = Similarity.bruteForce(spark, dir, k = 1000)
      .select("qid", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.filter { case (q, v, _) => labels(v) == labels(q) }
        .sortBy(r => (-r._3, r._2)).map(_._2).take(10)).toMap
    got.groupBy(_._1).foreach { case (q, hits) =>
      assert(hits.map(_._3).toSet == exact(q).toSet, s"query $q head mismatch")
    }
  }

  test("HLL sketches: contract holds and partial sketches merge losslessly") {
    val got = TextAnalysis.distinctTokensHll(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Boolean)].collect()
    assert(got.nonEmpty && got.forall(_._3), got.toSeq)
    // mergeability — the property that makes the sketch the scale
    // shape: union of per-half sketches == sketch of the whole
    val terms = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .where(col("term") =!= "")
    val whole = terms
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(term, 12))")).as[Long].head()
    val halves = terms
      .groupBy((col("doc_id") % 2).as("half"))
      .agg(expr("hll_sketch_agg(term, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Long].head()
    assert(whole == halves, s"union estimate $halves != direct $whole")
  }

  test("frequent-items sketch is exact below capacity, partitioning-invariant") {
    // 20 distinct items (< 64 tracked), skewed counts; the sketch's
    // per-partition partials must merge to the exact multiset counts
    val rows = (0 until 2000).map(i => (i.toLong, s"t${i % 20}"))
    val df = rows.toDF("id", "term")
    def top(d: org.apache.spark.sql.DataFrame) = d
      .agg(expr("approx_top_k(term, 40, 64)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("term"), col("e.count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(top(df) == exact)
    assert(top(df.repartition(13)) == exact)
  }

  test("bloomMembership: no misses, bounded false positives, m sizes the rate") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.bloomMembership(spark, dir)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    val (members, nonMembers) = out.partition(_._2)
    assert(members.nonEmpty && nonMembers.nonEmpty)
    // the Bloom guarantee: a member NEVER reads absent
    assert(members.forall(_._3), "a member fingerprint read absent")
    // non-members read present only at the false-positive rate:
    // p ≈ (1 - e^(-kn/m))^k — with n=|corpus|, k=3, m=2^14 that is
    // well under 1% at this SF; allow generous slack over ~30 probes
    val fp = nonMembers.count(_._3).toDouble / nonMembers.length
    assert(fp < 0.2, s"false-positive rate $fp implausibly high")
    // a filter 64x smaller saturates: the FP rate must rise strictly
    val tiny = Dedup.bloomMembership(spark, dir, mBits = 1 << 8)
      .as[(Long, Boolean, Boolean)].collect()
    val tinyFp = tiny.filter(!_._2).count(_._3).toDouble /
      tiny.count(!_._2)
    assert(tinyFp > fp, s"shrinking m did not raise the FP rate ($fp -> $tinyFp)")
    // members still never miss, even saturated
    assert(tiny.filter(_._2).forall(_._3))
  }

  test("cmsTermCounts: one-sided error, exact at low load, absent probes present") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.cmsTermCounts(spark, dir)
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // CMS guarantee: NEVER underestimates
    assert(out.forall(r => r._3 >= r._2), "CMS underestimated a count")
    assert(out.forall(r => r._4 == (r._3 == r._2)))
    // absent probes are present with cf 0
    val absent = out.filter(_._1.startsWith("absent_probe_"))
    assert(absent.length == 5 && absent.forall(_._2 == 0L))
    // the corpus vocabulary is far below d*w: most estimates exact
    val exactFrac = out.count(_._4).toDouble / out.length
    assert(exactFrac > 0.8, s"too many collisions at this load: $exactFrac")
    // truth side matches a direct recount for a spot term
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.analysis.Analyzers.default.tokensCol(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    out.filterNot(_._1.startsWith("absent_probe_")).take(20).foreach { r =>
      assert(truth(r._1) == r._2, s"cf mismatch for ${r._1}")
    }
    // a 16x smaller sketch must saturate: exactness strictly drops
    val tiny = TextAnalysis.cmsTermCounts(spark, dir, w = 64)
      .as[(String, Long, Long, Boolean)].collect()
    assert(tiny.forall(r => r._3 >= r._2))
    assert(tiny.count(_._4) < out.count(_._4),
      "shrinking w did not increase collisions")
  }

  test("language profiles are distinct and lowercase") {
    val langs = TextAnalysis.LangProfiles.map(_._1)
    assert(langs == langs.sorted && langs.distinct == langs)
    TextAnalysis.LangProfiles.foreach { case (_, ws) =>
      assert(ws.forall(w => w == w.toLowerCase))
    }
  }
}
