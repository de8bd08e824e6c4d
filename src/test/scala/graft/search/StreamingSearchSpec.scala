package graft.search

import graft.TestSpark
import graft.dsl.builders._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSearchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stats-free predicate agrees with indexed search matches") {
    val corpus = Seq(
      (1L, "spark joins data fast", "en"),
      (2L, "slow batch merge", "en"),
      (3L, "spark window functions", "fr")
    ).toDF("doc_id", "text", "lang")
    val idx = SearchIndex.build(corpus, IndexSpec("doc_id", Seq("text"), Seq("lang")))
    val queries = Seq(
      ("text" matchAny termSet("spark", "merge")) && ("lang" === "en"),
      "text" matchPhrase "spark window",
      "text".matchMin(2, termSet("spark", "data", "window")),
      "text" parseQuery "+spark -window")
    for (q <- queries) {
      val indexed = idx.search(q, 10).select("doc_id").as[Long].collect().toSet
      val streamy = corpus.where(QueryPredicates.predicate(q))
        .select("doc_id").as[Long].collect().toSet
      assert(streamy == indexed, s"query $q")
    }
    idx.unpersist()
  }

  test("phrase predicate survives docs shorter than the phrase") {
    val docs = Seq(
      (1L, "spark window functions shine"),
      (2L, "spark"), // shorter than the 2-term phrase
      (3L, ""), // empty text → zero tokens
      (4L, "window spark")
    ).toDF("doc_id", "text")
    val got = docs.where(QueryPredicates.predicate("text" matchPhrase "spark window"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("streaming ingest grows the index incrementally via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val spec = IndexSpec("doc_id", Seq("text"))
    var idx = SearchIndex.build(
      Seq((1L, "batch built corpus")).toDF("doc_id", "text"), spec)
    // every superseded generation gets unpersisted, mirroring how a
    // real ingest loop must manage cache lifetime
    val generations = scala.collection.mutable.ListBuffer(idx)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) { idx = idx.addDocuments(batch); generations += idx; () }
      }
      .start()
    mem.addData((2L, "streamed corpus addition"), (3L, "another streamed doc"))
    q.processAllAvailable()
    q.stop()
    assert(idx.fieldStats("text").numDocs == 3L)
    val hits = idx.search("text" matchTerm "streamed", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(2L, 3L))
    // global IDF reflects the grown corpus: df("corpus")=2, N=3
    val idf = idx.getTermIDFs.where($"term" === "corpus")
      .select("idf").as[Double].head()
    assert(math.abs(idf - math.log(1.0 + (3 - 2 + 0.5) / 2.5)) < 1e-9)
    generations.foreach(_.unpersist())
  }

  test("standing query filters a live document stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = docs.where(QueryPredicates.predicate("text" matchAllText "spark stream"))
      .writeStream.format("memory").queryName("standing_query_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "spark stream processing"), (2L, "batch only"), (3L, "stream of spark events"))
    q.processAllAvailable()
    val got = spark.table("standing_query_sink").select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
    q.stop()
  }
}
