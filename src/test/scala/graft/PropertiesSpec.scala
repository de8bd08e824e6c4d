package graft

import graft.dsl.{AllDocs, And, Boost, GeFilter, GtFilter, LtFilter, MatchFuzzy,
  MatchPhrase, MatchRegex, MatchText, MatchWildcard, Not, Or, Parsed, RangeFilter, Should}
import graft.functions.{ArrayCountEq, PhraseCount, TopKAgg, ScoredDoc, VecDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests for the engine's pure kernels —
  * expression eval vs naive reference implementations, parser
  * structure, bounded-top-k semantics. Deterministic seeds (no
  * scalatestplus bridge in the offline cache): each property is
  * checked over 100 generated samples.
  */
class PropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga.flatMap(a => gb.map(a -> _))).foreach { case (a, b) => f(a, b) }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga).foreach(f)

  private val token: Gen[String] = Gen.oneOf("a", "b", "c", "dd", "e1")
  private val tokens: Gen[List[String]] = Gen.listOfN(12, token).map(_.take(12))

  private def arrLit(xs: Seq[String]) =
    Literal(ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))

  test("ArrayCountEq equals naive count for arbitrary inputs") {
    forAll(tokens, token) { (xs, t) =>
      val got = ArrayCountEq(arrLit(xs), Literal(UTF8String.fromString(t), StringType))
        .eval(null).asInstanceOf[Int]
      assert(got == xs.count(_ == t))
    }
  }

  test("PhraseCount equals naive sliding-window count") {
    forAll(tokens, Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, token))) { (xs, p) =>
      val got = PhraseCount(arrLit(xs), arrLit(p)).eval(null).asInstanceOf[Int]
      val want =
        if (p.isEmpty || p.size > xs.size) 0
        else xs.sliding(p.size).count(_ == p)
      assert(got == want)
    }
  }

  test("VecDot equals naive dot product") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))
    forAll(vec, vec) { (a, b) =>
      val la = Literal(ArrayData.toArrayData(a.toArray),
        ArrayType(org.apache.spark.sql.types.DoubleType))
      val lb = Literal(ArrayData.toArrayData(b.toArray),
        ArrayType(org.apache.spark.sql.types.DoubleType))
      val got = VecDot(la, lb).eval(null).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(got == want) // bit-identical: same fold order
    }
  }

  test("TopKAgg reduce/merge semantics equal sort-take-k for any merge tree") {
    val doc = for {
      key <- Gen.chooseNum(0L, 50L)
      score <- Gen.chooseNum(0.0, 1.0)
    } yield ScoredDoc(key, score)
    forAll(Gen.listOf(doc), Gen.chooseNum(1, 5)) { (docs, k) =>
      val agg = new TopKAgg[Long](k)
      // arbitrary split into partitions, reduce each, merge pairwise
      val parts = docs.grouped(3).toList
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged).toList
      val want = docs.sortBy(d => (-d.score, d.key)).take(k)
      assert(got == want)
    }
  }

  test("random DSL ASTs: stats-free predicate matches indexed search (differential)") {
    import graft.dsl._
    import graft.search.{IndexSpec, QueryPredicates, SearchIndex}
    val spark = TestSpark.spark
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c dd"), (2L, "b b e1"), (3L, "c dd a a"),
      (4L, "e1"), (5L, ""), (6L, "dd dd dd b")
    ).toDF("doc_id", "text")
    val idx = SearchIndex.build(corpus, IndexSpec("doc_id", Seq("text")))
    // vocabulary terms + one absent term to exercise empty postings
    val term: Gen[String] = Gen.oneOf("a", "b", "c", "dd", "e1", "zz")
    val leaf: Gen[SearchQuery] = Gen.oneOf(
      term.map(t => MatchTerm("text", t)),
      Gen.listOfN(2, term).map(ts => MatchAnyTerms("text", ts.distinct)),
      // synonym groups: SynonymQuery scoring differs from Any, the
      // match set must not
      Gen.listOfN(2, term).map(ts => MatchSynonyms("text", ts.distinct)),
      Gen.listOfN(2, term).map(ts => MatchAllTerms("text", ts.distinct)),
      Gen.listOfN(2, term).map(ts => MatchPhrase("text", ts.mkString(" "))),
      // sloppy phrases: indexed phrase_count vs stats-free nested
      // exists must agree on the match set
      for { ts <- Gen.listOfN(2, term); s <- Gen.choose(0, 2) }
        yield MatchPhrase("text", ts.mkString(" "), s),
      Gen.listOfN(3, term).map(ts => MatchMin("text", 2, ts.distinct)),
      // multi-term leaves: indexed path expands the dictionary,
      // stats-free path matches per token — same match set required
      Gen.oneOf("?", "d*", "e?", "*d", "z*").map(p => MatchWildcard("text", p)),
      // regex leaves: indexed dictionary expansion vs per-token rlike
      // — both through LuceneRegex.translate, incl. Lucene-only
      // syntax (complement, intersection, any-string, quoted)
      Gen.oneOf(".", "d+", "e.", ".*d.*", "a|b", "[cd]d?",
          "~(d.*)", "@", "\"dd\"", "d.&~(dd)", "~(@)", "<1-12>")
        .map(p => MatchRegex("text", p)),
      for { t <- term; e <- Gen.choose(0, 2) } yield MatchFuzzy("text", t, e),
      // span-near leaves: indexed near_count vs stats-free nested
      // exists must agree (either order, i < j when a == b)
      for { a <- term; b <- term; d <- Gen.choose(1, 3) }
        yield MatchNear("text", a, b, d))
    val ast: Gen[SearchQuery] = for {
      l <- leaf; r <- leaf
      q <- Gen.oneOf[SearchQuery](l, And(l, r), Or(l, r), And(l, Not(r)),
        Boost(l, 2.0), // boost must never change the match set
        DisMax(Seq(l, r), 0.5), // dis-max match set = disjunction
        ConstScore(l, 2.0), // constant score keeps the match set
        Demote(l, r, 0.5)) // demotion keeps the positive's match set
    } yield q
    // 30 sampled ASTs: each check runs two Spark jobs
    samples(ast, 30).foreach { q =>
      val indexed = idx.search(q, 100).select("doc_id").as[Long].collect().toSet
      val predicate = corpus.where(QueryPredicates.predicate(q))
        .select("doc_id").as[Long].collect().toSet
      assert(predicate == indexed, s"divergence for AST: $q")
    }
    idx.unpersist()
  }

  test("resolveClusters equals brute-force union-find on random graphs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n,
        for { a <- Gen.choose(0L, 11L); b <- Gen.choose(0L, 11L) if a != b } yield (a, b)))
    def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    // 8 sampled graphs: each check runs an iterative Spark fixpoint
    samples(edgeGen, 8).foreach { edges =>
      val got = graft.pipeline.Dedup
        .resolveClusters(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == naive(edges), s"divergence for edges: $edges")
    }
  }

  test("Parsed.parseClauses classifies occurs and phrases") {
    val word: Gen[String] = Gen.oneOf("spark", "join", "fast")
    val clause: Gen[(Char, Boolean, String)] = for {
      occ <- Gen.oneOf(' ', '+', '-')
      phrase <- Gen.oneOf(true, false)
      w1 <- word; w2 <- word
    } yield (occ, phrase, if (phrase) s"$w1 $w2" else w1)
    forAll(Gen.listOfN(4, clause)) { cs =>
      val q = cs.map { case (occ, phrase, text) =>
        val o = if (occ == ' ') "" else occ.toString
        if (phrase) s"""$o"$text"""" else s"$o$text"
      }.mkString(" ")
      val parsed = Parsed.parseClauses(q)
      assert(parsed.size == cs.size)
      parsed.zip(cs).foreach { case (p, (occ, phrase, text)) =>
        assert(p.occur == occ)
        assert(p.isPhrase == phrase)
        assert(p.text == text)
      }
    }
  }

  test("Parsed boolean grammar: field scoping, AND/OR/NOT, parens") {
    def p(q: String) = Parsed.desugar("text", q)
    def t(w: String) = MatchText("text", w)
    assert(p("(spark AND join) OR window") == Or(And(t("spark"), t("join")), t("window")))
    assert(p("lang:fr AND vector") == And(MatchText("lang", "fr"), t("vector")))
    // pure-negative queries fold over AllDocs so matching docs score
    // 1.0, consistent with the legacy flat grammar's "-spark"
    assert(p("NOT spark") == And(AllDocs, Not(t("spark"))))
    assert(p("a OR NOT (b AND c)") == Or(t("a"), Not(And(t("b"), t("c")))))
    assert(p("title:\"big data\" OR spark") ==
      Or(MatchPhrase("title", "big data"), t("spark")))
    // adjacency inside boolean mode is implicit OR (Lucene default op)
    assert(p("spark join OR window") == Or(Or(t("spark"), t("join")), t("window")))
    // '-' inside boolean mode negates its clause
    assert(p("(spark AND -join)") == And(t("spark"), Not(t("join"))))
    // '+' inside boolean mode is REQUIRED (Lucene occur semantics):
    // bare adjacent chunks demote to optional scoring, never OR away
    // the requirement
    assert(p("+error (warn fatal)") ==
      And(t("error"), Should(Or(t("warn"), t("fatal")))))
    assert(p("(warn fatal) +error") ==
      And(t("error"), Should(Or(t("warn"), t("fatal")))))
    // legacy flat-clause mode is untouched...
    assert(p("+spark join -window") ==
      And(And(t("spark"), Should(t("join"))), Not(t("window"))))
    // ...and supports field scoping too
    assert(p("+lang:fr +vector") == And(MatchText("lang", "fr"), t("vector")))
  }

  test("Parsed QueryParser extras: boost, fuzzy, wildcard, ranges") {
    def p(q: String) = Parsed.desugar("text", q)
    def t(w: String) = MatchText("text", w)
    // clause boosts, on bare, occur-prefixed, and field-scoped clauses
    assert(p("spark^2 join") == Or(Boost(t("spark"), 2.0), t("join")))
    assert(p("+spark^2 join") ==
      And(Boost(t("spark"), 2.0), Should(t("join"))))
    assert(p("lang:fr^3 AND vector") ==
      And(Boost(MatchText("lang", "fr"), 3.0), t("vector")))
    // group boost
    assert(p("(spark AND join)^0.5 OR window") ==
      Or(Boost(And(t("spark"), t("join")), 0.5), t("window")))
    // fuzzy: explicit edits, default edits, suffix order ~N^f
    assert(p("spakr~1") == MatchFuzzy("text", "spakr", 1))
    assert(p("spakr~") == MatchFuzzy("text", "spakr", 2))
    assert(p("spakr~1^2") == Boost(MatchFuzzy("text", "spakr", 1), 2.0))
    // wildcards, lowercased like QueryParser's default normalization
    assert(p("Spa*") == MatchWildcard("text", "spa*"))
    assert(p("jo?n AND spark") == And(MatchWildcard("text", "jo?n"), t("spark")))
    // escapes are per CHARACTER: an escaped '*' is literal, but a live
    // '*' after some other escape keeps wildcard semantics
    assert(p("wild\\*card") == t("wild*card"))
    assert(p("path\\\\*") == MatchWildcard("text", "path\\*"))
    // field-scoped groups: leaves inside default to the scope field;
    // an inner explicit field still wins; occur prefixes carry over
    assert(p("lang:(en fr)") == Or(MatchText("lang", "en"), MatchText("lang", "fr")))
    assert(p("lang:(body:x y)") == Or(MatchText("body", "x"), MatchText("lang", "y")))
    assert(p("+lang:(en fr) spark") ==
      And(Or(MatchText("lang", "en"), MatchText("lang", "fr")), Should(t("spark"))))
    assert(p("title:(a b) window") ==
      Or(Or(MatchText("title", "a"), MatchText("title", "b")), t("window")))
    // phrase slop carries into the AST (ordered-window matching)
    assert(p("\"big data\"~2") == MatchPhrase("text", "big data", 2))
    assert(p("\"big data\"") == MatchPhrase("text", "big data"))
    // regex terms: bare, field-scoped, escaped slash, occur prefix
    assert(p("/sp.rk/") == MatchRegex("text", "sp.rk"))
    assert(p("lang:/en|fr/") == MatchRegex("lang", "en|fr"))
    assert(p("/a\\/b/") == MatchRegex("text", "a/b"))
    assert(p("+/jo.n/ spark") ==
      And(MatchRegex("text", "jo.n"), Should(t("spark"))))
    assert(p("/d\\d+/") == MatchRegex("text", "d\\d+")) // regex escapes survive
    // ranges: inclusive, exclusive, mixed, open-ended, numeric coercion
    assert(p("n_chars:[200 TO 480]") == RangeFilter("n_chars", 200L, 480L))
    assert(p("n_chars:{200 TO 480}") ==
      And(GtFilter("n_chars", 200L), LtFilter("n_chars", 480L)))
    assert(p("n_chars:[200 TO 480}") ==
      And(GeFilter("n_chars", 200L), LtFilter("n_chars", 480L)))
    assert(p("n_chars:[200 TO *]") == GeFilter("n_chars", 200L))
    assert(p("lang:[aa TO fr]") == RangeFilter("lang", "aa", "fr"))
    assert(p("score:[0.5 TO 1.5]") == RangeFilter("score", 0.5, 1.5))
    // occur prefixes compose with the new leaves
    assert(p("+n_chars:[200 TO 480] +group") ==
      And(RangeFilter("n_chars", 200L, 480L), t("group")))
    assert(p("-spa* +join") == And(t("join"), Not(MatchWildcard("text", "spa*"))))
  }

  test("Parsed malformed-input hardening: dangling operators, overflow, occur groups") {
    def p(q: String) = Parsed.desugar("text", q)
    def t(w: String) = MatchText("text", w)
    // dangling '~' / '^' tokens are dropped, never loop the lexer
    assert(p("~") == AllDocs)
    assert(p("^") == AllDocs)
    assert(p("spark ~ join") == Or(t("spark"), t("join")))
    assert(p("a ^ b") == Or(t("a"), t("b")))
    assert(p("+~") == AllDocs)
    // fuzzy edit counts overflowing Int keep the Lucene default (2)
    assert(p("spark~99999999999") == MatchFuzzy("text", "spark", 2))
    // malformed field-group forms stay total: dangling open scope,
    // empty group, nested scopes, boost after the scoped group
    assert(p("lang:(") == AllDocs)
    assert(p("lang:()") == AllDocs)
    assert(p("lang:(a") == MatchText("lang", "a")) // unbalanced close tolerated
    assert(p("a:(b:(c d))") == Or(MatchText("b", "c"), MatchText("b", "d")))
    // inner scope pops: e is back under the outer scope
    assert(p("a:(b:(c) e)") == Or(MatchText("b", "c"), MatchText("a", "e")))
    // a bare `:(` (empty field name) is NOT a field scope: the group
    // parses under the default field, as it did before field groups
    assert(p("hello :(sad face)") ==
      Or(t("hello"), Or(t("sad"), t("face"))))
    assert(p("lang:(en fr)^2") ==
      Boost(Or(MatchText("lang", "en"), MatchText("lang", "fr")), 2.0))
    // occur prefix on a group carries Lucene required/prohibited
    // semantics instead of silently degrading to a plain group
    assert(p("+(warn fatal) error") ==
      And(Or(t("warn"), t("fatal")), Should(t("error"))))
    assert(p("-(warn fatal) error") ==
      And(t("error"), Not(Or(t("warn"), t("fatal")))))
    // boolean-mode pure-negative matches the flat grammar's AST exactly
    assert(p("(-a -b)") == p("-a -b"))
  }

  test("Parsed backslash escapes follow Lucene rules") {
    def p(q: String) = Parsed.desugar("text", q)
    def t(w: String) = MatchText("text", w)
    // escaped ':' joins the term — no field split
    assert(p("foo\\:bar") == t("foo:bar"))
    // escaped wildcard chars are literal, never MatchWildcard
    assert(p("wild\\*card") == t("wild*card"))
    assert(p("who\\?") == t("who?"))
    // escaped keyword is a literal term, not an operator
    assert(p("a \\AND b") == Or(Or(t("a"), t("AND")), t("b")))
    // escaped quote embeds in a phrase
    assert(p("\"a \\\"b\\\" c\"") == MatchPhrase("text", "a \"b\" c"))
    // escaped '~' suppresses fuzzy parsing
    assert(p("spark\\~2") == t("spark~2"))
    // escapes work in field values too
    assert(p("lang:a\\:b") == MatchText("lang", "a:b"))
    // unescaped behavior is untouched
    assert(p("spa*") == MatchWildcard("text", "spa*"))
  }

  test("Parsed.desugar total: any operator soup terminates without throwing") {
    // fuzz the full query-syntax charset — every character the lexer
    // treats specially plus word chars; desugar must terminate and
    // produce SOME ast for all of them (user-supplied query strings
    // reach this via parseQuery, so non-termination hangs the driver)
    val special = Gen.oneOf("+-\"():~^[]{}*?\\ \t.ABCDEFandorNOT059".toSeq)
    forAll(Gen.listOf(special)) { cs =>
      val q = cs.mkString
      val ast = Parsed.desugar("text", q) // must not throw or hang
      assert(ast != null)
    }
  }

  test("shingle arrays contain only n-token shingles") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    forAll(Gen.listOfN(10, token)) { xs =>
      val got = Seq(xs).toDF("tokens")
        .select(graft.pipeline.Dedup.shingles(col("tokens"), 3).as("s"))
        .as[Seq[String]].head()
      assert(got.forall(_.split(" ").length == 3))
      if (xs.size >= 3) assert(got.nonEmpty) else assert(got.isEmpty)
    }
  }

  test("ivfTopKFor probing ALL cells equals exact top-k for random queries") {
    // with nProbe = nCentroids every cell is probed, so the TABLE-form
    // IVF pipeline (distributed probe-cell selection + cell join +
    // rerank) degenerates to exact search — a random-query end-to-end
    // check that the selection/join/top-k machinery loses nothing.
    // The driver reference replays vec_dot's sequential left fold
    // bit-exactly, so rankings cannot drift on float association.
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Seq[Double])].collect()
    val dim = corpus.head._2.length
    val coord: Gen[Double] = Gen.chooseNum(-1.0, 1.0)
    val qvecs = samples(Gen.listOfN(dim, coord), 20).map(_.toArray)
    val qdf = qvecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("qid", "qv")
    val got = graft.pipeline.Similarity
      .ivfTopKFor(spark, dir, qdf, "qid", "qv", k = 5, nProbe = 16)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    def dot(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    qvecs.zipWithIndex.foreach { case (q, i) =>
      val qn = math.sqrt(dot(q, q.toSeq))
      val expected = corpus
        .map { case (id, v) =>
          (id, dot(q, v) / (math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)) * qn))
        }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(5).map(_._1).toSeq
      assert(got(i.toLong) == expected, s"query $i diverged from exact top-k")
    }
  }
}
