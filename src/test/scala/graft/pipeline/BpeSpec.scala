package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("learnFromVocab reproduces the published golden example") {
    // Sennrich et al. 2016, §3.2: {low:5, lower:2, newest:6, widest:3}
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnFromVocab(vocab, numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("e", "s", 9L),
      ("es", "t", 9L),
      ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L),
      ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
    // the learned merges segment an UNSEEN word into learned subwords
    assert(Bpe.segment("lowest", merges) == Seq("low", "est" + Bpe.EndOfWord))
  }

  test("merge loop stops when no pair occurs twice") {
    val merges = Bpe.learnFromVocab(Seq(("ab", 1L)), numMerges = 10)
    assert(merges.isEmpty)
  }

  test("corpus learning is deterministic and count-monotone") {
    val dir = "/root/testdata/sf0.001"
    val a = Bpe.learn(spark, dir, numMerges = 10, vocabCap = 500)
    val b = Bpe.learn(spark, dir, numMerges = 10, vocabCap = 500)
    assert(a == b, "same corpus + params must learn identical merges")
    assert(a.nonEmpty)
    // pair counts never increase with rank: a later merge can only be
    // built from what earlier merges left behind
    assert(a.map(_.count).zip(a.tail.map(_.count)).forall { case (x, y) => x >= y })
    // segmentation with the full merge list round-trips concatenation
    val w = a.head.left + a.head.right
    val segs = Bpe.segment(w.replace(Bpe.EndOfWord, ""), a)
    assert(segs.mkString("").stripSuffix(Bpe.EndOfWord) ==
      w.replace(Bpe.EndOfWord, ""))
  }

  test("segmentation dictionary round-trips every vocabulary word") {
    val dir = "/root/testdata/sf0.001"
    val seg = Bpe.segmentationSeq(spark, dir, numMerges = 20, vocabCap = 500)
    assert(seg.nonEmpty)
    seg.foreach { case (word, pieces, n) =>
      val ps = pieces.split(" ").toSeq
      assert(ps.size == n, s"$word piece count")
      // concatenation-invertible: pieces re-concatenate to word + </w>
      assert(ps.mkString("") == word + Bpe.EndOfWord, s"$word: $pieces")
    }
    // the distributed encode covers every doc with at least one token
    val enc = Bpe.encode(spark, dir, numMerges = 20, vocabCap = 500)
    import org.apache.spark.sql.functions._
    val docsWithTokens = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(graft.analysis.Analyzers.default.tokensCol(col("text"))) > 0)
      .count()
    assert(enc.count() == docsWithTokens)
  }

  test("distributed decode inverts the encoded piece stream exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val decoded = Bpe.decodeRoundtrip(spark, dir, numMerges = 20, vocabCap = 500)
      .as[(Long, String)].collect().toMap
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", graft.analysis.Analyzers.default.tokensCol(col("text"))).as("t"))
      .where(col("t") =!= "")
      .as[(Long, String)].collect().toMap
    assert(decoded.keySet == expected.keySet)
    decoded.foreach { case (id, d) =>
      assert(d == expected(id), s"doc $id decode mismatch")
    }
  }
}
