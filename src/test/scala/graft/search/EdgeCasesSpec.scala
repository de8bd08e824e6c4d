package graft.search

import graft.TestSpark
import graft.dsl.builders._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs a production index must survive: empty corpora,
  * empty documents, absent terms, k larger than the corpus, null
  * keyword fields. */
class EdgeCasesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty corpus builds and searches to empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val idx = SearchIndex.build(empty, IndexSpec("doc_id", Seq("text")))
    assert(idx.search("text" matchTerm "anything", 5).count() == 0)
    assert(idx.getTermCounts.count() == 0)
    assert(idx.fieldStats("text").numDocs == 0L)
    idx.unpersist()
  }

  test("empty and whitespace-only documents index without error") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real words here")).toDF("doc_id", "text")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text")))
    assert(idx.search("text" matchTerm "words", 5)
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
    assert(idx.search("text" matchPhrase "real words here extra", 5).count() == 0)
    assert(idx.getDocumentCounts.where($"field" === "text")
      .select("n_docs").as[Long].head() == 1L)
    idx.unpersist()
  }

  test("absent terms score nothing; k larger than corpus truncates") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text")))
    assert(idx.search("text" matchTerm "missingterm", 10).count() == 0)
    assert(idx.search("text" matchAny termSet("alpha", "beta"), 100).count() == 2)
    val batch = idx.batchSearch(
      Seq((1L, "text", Seq("missingterm"), 1)).toDF("qid", "field", "terms", "min_match"), 5)
    assert(batch.count() == 0)
    idx.unpersist()
  }

  test("null keyword fields neither match nor break filters") {
    val docs = Seq((1L, "a doc", Some("en")), (2L, "b doc", None))
      .toDF("doc_id", "text", "lang")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text"), Seq("lang")))
    assert(idx.search(all && ("lang" === "en"), 5)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(idx.search(all && missing("lang"), 5)
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(idx.getDocumentCounts.where($"field" === "lang")
      .select("n_docs").as[Long].head() == 1L)
    idx.unpersist()
  }

  test("getElements with no matching keys is empty, not an error") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text")))
    assert(idx.getElements(Seq(99L)).count() == 0)
    idx.unpersist()
  }

  test("validateUniqueKeys enforces the keyCol contract") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val idx = SearchIndex.build(dup, IndexSpec("doc_id", Seq("text")))
    val e = intercept[IllegalArgumentException](idx.validateUniqueKeys())
    assert(e.getMessage.contains("duplicate doc_id"))
    idx.unpersist()
    val ok = SearchIndex.build(Seq((1L, "a")).toDF("doc_id", "text"),
      IndexSpec("doc_id", Seq("text")))
    ok.validateUniqueKeys() // no throw
    ok.unpersist()
  }

  test("unsupported key type fails fast with a clear message") {
    val docs = Seq((1.5, "x")).toDF("doc_id", "text")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text")))
    val e = intercept[IllegalArgumentException] {
      idx.batchSearch(
        Seq((1L, "text", Seq("x"), 1)).toDF("qid", "field", "terms", "min_match"), 5)
        .collect()
    }
    assert(e.getMessage.contains("integral or string"))
    idx.unpersist()
  }

  test("queryJoinDsl fails fast on a left larger than the collect cap") {
    // queryJoinDsl is the one API that collects its left to the
    // driver (the bounded-left fallback); above the cap it must
    // refuse with a pointer at the distributed path instead of
    // attempting a corpus-sized collect
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val idx = SearchIndex.build(docs, IndexSpec("doc_id", Seq("text")))
    val left = spark.range(0, 100).toDF("qid")
    val saved = SearchIndex.queryJoinDslMaxLeft
    try {
      SearchIndex.queryJoinDslMaxLeft = 10
      val e = intercept[IllegalArgumentException] {
        idx.queryJoinDsl(left, "qid", _ => "text" matchTerm "beta", 3)
      }
      assert(e.getMessage.contains("queryJoinAst"))
      assert(e.getMessage.contains("queryJoinDslMaxLeft"))
      // at the cap boundary it still runs
      SearchIndex.queryJoinDslMaxLeft = 100
      assert(idx.queryJoinDsl(left, "qid", _ => "text" matchTerm "beta", 3).count() > 0)
    } finally {
      SearchIndex.queryJoinDslMaxLeft = saved
      idx.unpersist()
    }
  }
}
