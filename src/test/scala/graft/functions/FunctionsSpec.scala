package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("array_count_eq counts occurrences (codegen path)") {
    SearchExpressions.register(spark)
    val df = Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq.empty[String]),
      (3L, Seq("x"))
    ).toDF("id", "arr")
    val got = df.select($"id", call_function("array_count_eq", $"arr", lit("a")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2, 2L -> 0, 3L -> 0))
  }

  test("array_count_eq works from SQL text") {
    SearchExpressions.register(spark)
    Seq((Seq("q", "q", "r"), "q")).toDF("arr", "t").createOrReplaceTempView("ace_t")
    assert(spark.sql("SELECT array_count_eq(arr, t) FROM ace_t").as[Int].head() == 2)
  }

  test("array_count_in matches the filter+isInCollection HOF") {
    SearchExpressions.register(spark)
    val words = Seq("the", "and", "of")
    val df = Seq(
      (1L, Seq("the", "cat", "and", "the", "dog")),
      (2L, Seq.empty[String]),
      (3L, Seq("xyz"))
    ).toDF("id", "arr")
    val native = df.select($"id",
      call_function("array_count_in", $"arr", array(words.map(lit): _*)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(native == Map(1L -> 3, 2L -> 0, 3L -> 0))
    // differential vs the HOF it replaces
    val hof = df.select($"id",
      size(filter($"arr", t => t.isInCollection(words))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(native == hof)
  }

  test("multi_count_in matches independent array_count_in probes, lists may overlap") {
    SearchExpressions.register(spark)
    val lists = Seq(Seq("the", "and"), Seq("la", "de"), Seq("the", "la")) // overlaps both
    val df = Seq(
      (1L, Seq("the", "la", "the", "cat")),
      (2L, Seq.empty[String]),
      (3L, Seq("de", "xyz", null))
    ).toDF("id", "arr")
    val listsLit = array(lists.map(ws => array(ws.map(lit): _*)): _*)
    val fused = df.select($"id", call_function("multi_count_in", $"arr", listsLit).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val probes = df.select($"id" +:
        lists.zipWithIndex.map { case (ws, i) =>
          call_function("array_count_in", $"arr", array(ws.map(lit): _*)).as(s"c$i")
        }: _*)
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    assert(fused == probes, s"fused=$fused probes=$probes")
    assert(fused(1L) == Seq(2, 1, 3)) // 'the' x2; 'la' x1; 'the'+'the'+'la' = 3
  }

  test("multi_substr_count matches length(replace()) greedy non-overlap counting") {
    SearchExpressions.register(spark)
    val lists = Seq(Seq("aa", "the"), Seq("he ", "héé"))
    val df = Seq(
      (1L, "aaaa the cat"),       // 'aa' greedy -> 2 (not 3 sliding)
      (2L, "the héé and the end"),
      (3L, ""),
      (4L, "ééaaéé aa héé he ")   // multi-byte neighbors, ASCII pattern
    ).toDF("id", "txt")
    val listsLit = array(lists.map(ws => array(ws.map(lit): _*)): _*)
    val fused = df.select($"id",
        call_function("multi_substr_count", $"txt", listsLit).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    def cnt(g: String) =
      ((length($"txt") - length(replace($"txt", lit(g), lit("")))) / g.length).cast("long")
    val ref = df.select($"id" +: lists.zipWithIndex.map { case (ws, i) =>
        ws.map(cnt).reduceLeft(_ + _).as(s"c$i")
      }: _*)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> Seq(r._2, r._3)).toMap
    assert(fused == ref, s"fused=$fused ref=$ref")
    assert(fused(1L) == Seq(3L, 1L)) // aa x2 (greedy) + the x1; "he " inside "the cat"
  }

  test("multi_substr_count handles patterns longer than 8 UTF-8 bytes") {
    SearchExpressions.register(spark)
    // a CJK trigram is 9 UTF-8 bytes — the hashed-window path with
    // exact byte verification (a packed-long key cannot hold it)
    val lists = Seq(Seq("日本語", "the"), Seq("ことばです"))
    val df = Seq(
      (1L, "日本語の日本語 the ことばです"),
      (2L, "日本 語 no trigram here"),
      (3L, "ことばですことばです")
    ).toDF("id", "txt")
    val listsLit = array(lists.map(ws => array(ws.map(lit): _*)): _*)
    val fused = df.select($"id",
        call_function("multi_substr_count", $"txt", listsLit).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    def cnt(g: String) =
      ((length($"txt") - length(replace($"txt", lit(g), lit("")))) / g.length).cast("long")
    val ref = df.select($"id" +: lists.zipWithIndex.map { case (ws, i) =>
        ws.map(cnt).reduceLeft(_ + _).as(s"c$i")
      }: _*)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> Seq(r._2, r._3)).toMap
    assert(fused == ref, s"fused=$fused ref=$ref")
    assert(fused(1L) == Seq(3L, 1L) && fused(3L) == Seq(0L, 2L))
  }

  test("array_total_strlen matches aggregate(transform(length)) HOF") {
    SearchExpressions.register(spark)
    val df = Seq(
      (1L, Seq("ab", "cde", "")),
      (2L, Seq.empty[String]),
      (3L, Seq("日本語")) // multibyte: numChars, not bytes
    ).toDF("id", "arr")
    val native = df.select($"id",
      call_function("array_total_strlen", $"arr").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(native == Map(1L -> 5, 2L -> 0, 3L -> 3))
    val hof = df.select($"id",
      aggregate(transform($"arr", t => length(t)), lit(0), (a, x) => a + x).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(native == hof)
  }

  test("phrase_count counts contiguous overlapping occurrences") {
    SearchExpressions.register(spark)
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq("a", "a", "a")),
      (3L, Seq("b"))
    ).toDF("id", "arr")
    val ab = df.select($"id",
      call_function("phrase_count", $"arr", array(lit("a"), lit("b"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(ab == Map(1L -> 2, 2L -> 0, 3L -> 0))
    val aa = df.select($"id",
      call_function("phrase_count", $"arr", array(lit("a"), lit("a"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(aa == Map(1L -> 0, 2L -> 2, 3L -> 0)) // overlapping starts count
  }

  test("phrase_count slop: ordered window with greedy-minimal span") {
    SearchExpressions.register(spark)
    def n(tokens: Seq[String], phrase: Seq[String], slop: Int): Int =
      Seq(Tuple1(tokens)).toDF("arr").select(
        call_function("phrase_count", $"arr",
          array(phrase.map(lit): _*), lit(slop)).as("n"))
        .as[Int].head()
    // one gap needs slop 1
    assert(n(Seq("a", "x", "b"), Seq("a", "b"), 0) == 0)
    assert(n(Seq("a", "x", "b"), Seq("a", "b"), 1) == 1)
    // budget is TOTAL extra positions across the whole phrase
    assert(n(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c"), 1) == 0)
    assert(n(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c"), 2) == 1)
    // order is forced BELOW slop 2 (Lucene: a transposition costs
    // matchLength 2)
    assert(n(Seq("b", "x", "a"), Seq("a", "b"), 1) == 0)
    // slop 0 equals the exact-adjacency semantics
    assert(n(Seq("a", "b", "a", "b", "a"), Seq("a", "b"), 0) == 2)
    // overlapping sloppy starts each count
    assert(n(Seq("a", "a", "b"), Seq("a", "b"), 1) == 2)
    // greedy earliest is minimal-span exact: a-b at distance 2 when a
    // nearer non-matching token intervenes
    assert(n(Seq("a", "c", "b"), Seq("a", "b"), 1) == 1)
    // repeated phrase terms
    assert(n(Seq("a", "x", "a"), Seq("a", "a"), 1) == 1)
    assert(n(Seq("a", "x", "a"), Seq("a", "a"), 0) == 0)
  }

  test("phrase_count slop >= 2: Lucene sloppy semantics admit transpositions") {
    SearchExpressions.register(spark)
    def n(tokens: Seq[String], phrase: Seq[String], slop: Int): Int =
      Seq(Tuple1(tokens)).toDF("arr").select(
        call_function("phrase_count", $"arr",
          array(phrase.map(lit): _*), lit(slop)).as("n"))
        .as[Int].head()
    // the canonical Lucene case: "b a" matches "a b"~2 (matchLength
    // 2), not "a b"~1
    assert(n(Seq("b", "a"), Seq("a", "b"), 2) == 1)
    // adjusted span: a@2 adj 2, b@0 adj -1 -> matchLength 3
    assert(n(Seq("b", "x", "a"), Seq("a", "b"), 2) == 0)
    assert(n(Seq("b", "x", "a"), Seq("a", "b"), 3) == 1)
    // 3-term out-of-order: c a b vs "a b c" -> adj (1, 1, -2), span 3
    assert(n(Seq("c", "a", "b"), Seq("a", "b", "c"), 2) == 0)
    assert(n(Seq("c", "a", "b"), Seq("a", "b", "c"), 3) == 1)
    // injective assignment: repeated query terms need DISTINCT
    // positions; tf counts term-0 anchors that admit one
    assert(n(Seq("a", "x", "a"), Seq("a", "a"), 2) == 1)
    assert(n(Seq("a", "x", "a"), Seq("a", "a"), 3) == 2)
    // ordered matches still count at slop >= 2
    assert(n(Seq("a", "x", "x", "b"), Seq("a", "b"), 2) == 1)
    // the regimes agree at their boundary: every slop-1 match is a
    // slop-2 match
    assert(n(Seq("a", "x", "b"), Seq("a", "b"), 2) == 1)
  }

  test("TopKAgg keeps bounded top-k with deterministic order") {
    val topk = TopKAgg.topk(3)
    val df = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7), (1L, 13L, 0.9), (1L, 14L, 0.1),
      (2L, 20L, 1.0)
    ).toDF("g", "key", "score")
    val got = df.groupBy($"g").agg(topk($"key", $"score").as("hits"))
      .select($"g", $"hits").as[(Long, Seq[(Long, Double)])].collect().toMap
    // score desc, key asc on ties: 11 (0.9), 13 (0.9), 12 (0.7)
    assert(got(1L) == Seq((11L, 0.9), (13L, 0.9), (12L, 0.7)))
    assert(got(2L) == Seq((20L, 1.0)))
  }

  test("string tie-break matches Spark's UTF-8 binary sort order") {
    val emoji = new String(Character.toChars(0x1F600)) // supplementary plane
    val high = "\uFFFD" // high BMP char: UTF-16 sorts it AFTER the
    // emoji's surrogate pair, UTF-8/code-point order sorts it BEFORE
    assert(TopKAgg.Utf8Ordering.compare(high, emoji) < 0)
    assert(Ordering.String.compare(high, emoji) > 0) // the trap, for contrast
    // end-to-end: aggregator tie-break == Spark orderBy on the key
    val topk = TopKAgg.topkString(2)
    val df = Seq((1L, emoji, 0.5), (1L, high, 0.5), (1L, "zz", 0.5)).toDF("g", "key", "score")
    val agg = df.groupBy($"g").agg(topk($"key", $"score").as("hits"))
      .select($"hits").as[Seq[(String, Double)]].head().map(_._1)
    val sql = df.orderBy($"score".desc, $"key".asc).limit(2)
      .select("key").as[String].collect().toSeq
    assert(agg == sql)
  }

  test("TopKAgg result is partitioning-invariant") {
    val topk = TopKAgg.topk(2)
    val data = (1 to 100).map(i => (i % 3L, i.toLong, (i * 37 % 100) / 100.0))
    for (n <- Seq(1, 4, 8)) {
      val df = data.toDF("g", "key", "score").repartition(n)
      val got = df.groupBy($"g").agg(topk($"key", $"score").as("hits"))
        .select($"g", $"hits").as[(Long, Seq[(Long, Double)])].collect().toMap
      val want = data.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).take(2).toSeq).toMap
      got.foreach { case (g, hits) => assert(hits == want(g), s"group $g under $n partitions") }
    }
  }
}
