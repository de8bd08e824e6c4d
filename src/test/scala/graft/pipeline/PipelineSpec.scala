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

  test("multimodal stub decode is deterministic and length-derived") {
    val (n, w, h, f) = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    assert(n == 11L && w == 11L && h == 77L && f == 12L)
  }

  test("language profiles are distinct and lowercase") {
    val langs = TextAnalysis.LangProfiles.map(_._1)
    assert(langs == langs.sorted && langs.distinct == langs)
    TextAnalysis.LangProfiles.foreach { case (_, ws) =>
      assert(ws.forall(w => w == w.toLowerCase))
    }
  }
}
