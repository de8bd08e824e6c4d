package graft.analysis

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyzersSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def colTokens(a: Analyzer, text: String): Seq[String] =
    Seq(text).toDF("t").select(a.tokensCol(col("t"))).as[Seq[String]].head()

  test("default analyzer: lowercase + split non-alphanumeric") {
    assert(Analyzers.default.analyze("Hello, World! 42x") == Seq("hello", "world", "42x"))
    assert(Analyzers.default.analyze("") == Nil)
  }

  test("column and driver forms agree") {
    for (a <- Analyzers.registry.values; text <- Seq(
      "The quick brown Fox, jumping lazily!",
      "l'acqua delle alpi",
      "Running RUNNERS ran; it's {{template}} [[link|label]] ''bold''")) {
      assert(colTokens(a, text) == a.analyze(text), s"analyzer ${a.name} on '$text'")
    }
  }

  test("english analyzer stems and removes stopwords") {
    val got = Analyzers.english.analyze("The running dogs are jumping")
    assert(got == Seq("run", "dog", "jump"))
  }

  test("wikipedia analyzer strips markup and possessives") {
    val got = Analyzers.englishWikipedia.analyze(
      "''Islands'' are [[landmass|land]] surrounded by {{water template}} the sea's edge")
    assert(!got.contains("template"))
    assert(got.contains("land"))
    assert(got.contains("sea")) // possessive 's removed
  }

  test("italian analyzer: elision + stopwords + light stem") {
    val got = Analyzers.italian.analyze("l'acqua delle montagne")
    assert(got.head == "acqua" || got.head == "acqu")
    assert(!got.contains("delle"))
  }

  test("registry lookup") {
    assert(Analyzers("english").name == "english")
    intercept[IllegalArgumentException](Analyzers("nope"))
  }
}
