package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].head()

  private def regdom(u: String): String =
    Seq(u).toDF("u")
      .select(Urls.registeredDomain(Urls.hostOf(col("u")))).as[String].head()

  test("normalizeUrl: case, ports, fragments, tracking params, slashes") {
    assert(norm("HTTP://WWW.Example.COM:80/A/B/?utm_source=x&ref=y#frag")
      == "http://www.example.com/A/B")
    assert(norm("https://Host.com:443/p?id=3") == "https://host.com/p?id=3")
    // non-default port survives; path case survives
    assert(norm("http://h.com:8080/Path/") == "http://h.com:8080/Path")
    // leading tracker removed, surviving param regains its '?'
    assert(norm("http://h.com/p?utm_campaign=a&id=7&fbclid=b#s")
      == "http://h.com/p?id=7")
    assert(norm("http://h.com/p?gclid=1") == "http://h.com/p")
    // href= in a query VALUE must not false-match the ref= tracker
    assert(norm("http://h.com/p?href=z") == "http://h.com/p?href=z")
    // untouched clean URL is a fixpoint
    assert(norm("http://www.ex3.com/p/7?id=7") == "http://www.ex3.com/p/7?id=7")
    assert(norm(norm("HTTPS://H.com:443/x/?ref=r#f")) == "https://h.com/x")
  }

  test("registeredDomain: www strip, two-label default, cc-SLD third label") {
    assert(regdom("http://www.example.com/p") == "example.com")
    assert(regdom("http://News.Bbc.CO.UK/x") == "bbc.co.uk")
    assert(regdom("http://a.b.c.example.org/") == "example.org")
    assert(regdom("http://www.uni.ac.jp/") == "uni.ac.jp")
    assert(regdom("http://localhost/") == "localhost")
    // port excluded from the host
    assert(regdom("http://www.example.com:8080/p") == "example.com")
  }

  test("pageRank keeps a source-only node in the vector and flowing") {
    // a -> b, b -> a, c -> a: c has outlinks but NO inlinks — it must
    // stay in the rank vector at the base level and keep feeding a
    // (a groupBy(dst)-only rebuild would drop c after iteration 1 and
    // zero its contribution)
    val e = Seq(("a", "b", 1.0), ("b", "a", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "w")
    val r = Urls.pageRank(e, iterations = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(r.keySet == Set("a", "b", "c"))
    val base = 0.15 / 3
    assert(math.abs(r("c") - base) < 1e-12,
      s"source-only node must sit at the base term, got ${r("c")}")
    // a receives from both b and c, b only from a
    assert(r("a") > r("b") && r("b") > r("c"))
    // conservation: no dangling nodes here, so mass is preserved
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("dedupByUrl pairs every dirty variant with its clean page") {
    val d = Urls.dedupByUrl(spark, "/root/testdata/sf0.001")
      .select("doc_id", "canonical_id", "group_size")
      .as[(Long, Long, Long)].collect()
    // generator contract: docs 2k and 2k+1 share page k
    d.foreach { case (id, canon, size) =>
      assert(canon == (id / 2) * 2, s"doc $id canonical $canon")
      assert(size == 2, s"doc $id group size $size")
    }
  }
}
