package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class SourcesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wikipedia xml dump source reads pages") {
    val xml =
      """<mediawiki>
        |  <page>
        |    <title>Island</title>
        |    <ns>0</ns>
        |    <id>42</id>
        |    <revision><text>An island is land surrounded by water.</text></revision>
        |  </page>
        |  <page>
        |    <title>Lake</title>
        |    <ns>0</ns>
        |    <id>43</id>
        |    <revision><text>A lake is water surrounded by land.</text></revision>
        |  </page>
        |</mediawiki>""".stripMargin
    val dir = Files.createTempDirectory("wiki-xml")
    Files.write(dir.resolve("dump.xml"), xml.getBytes(StandardCharsets.UTF_8))
    val df = WikipediaXml.readPages(spark, dir.resolve("dump.xml").toString)
    val got = df.select("title", "text", "page_id").as[(String, String, Long)]
      .collect().sortBy(_._3)
    assert(got.length == 2)
    assert(got(0) == (("Island", "An island is land surrounded by water.", 42L)))
    assert(got(1)._1 == "Lake")
  }

  test("wikipedia corpus parquet round trip") {
    val df = Seq(("T", "body text", 0L, 1L)).toDF("title", "text", "ns", "page_id")
    val out = Files.createTempDirectory("wiki-corpus").resolve("corpus").toString
    WikipediaXml.writeCorpus(df, out, numFiles = 1)
    val back = WikipediaXml.readCorpus(spark, out)
    assert(back.count() == 1)
    assert(back.columns.toSet == Set("title", "text", "ns", "page_id"))
  }

  test("warc parser extracts records, headers and bodies") {
    val body1 = "<html><body><a href=\"http://example.com/x\">x</a></body></html>"
    val body2 = "warcinfo payload"
    val warc =
      s"""WARC/1.0\r
         |WARC-Type: warcinfo\r
         |WARC-Record-ID: <urn:uuid:aaa>\r
         |Content-Type: application/warc-fields\r
         |Content-Length: ${body2.length}\r
         |\r
         |${body2}WARC/1.0\r
         |WARC-Type: response\r
         |WARC-Target-URI: http://example.com/\r
         |WARC-Record-ID: <urn:uuid:bbb>\r
         |Content-Type: text/html\r
         |Content-Length: ${body1.length}\r
         |\r
         |$body1""".stripMargin
    val dir = Files.createTempDirectory("warc")
    Files.write(dir.resolve("test.warc"), warc.getBytes(StandardCharsets.UTF_8))
    val df = Warc.read(spark, dir.toString)
    val rows = df.orderBy("record_id").collect()
    assert(rows.length == 2)
    val info = rows.head
    assert(info.getAs[String]("warc_type") == "warcinfo")
    assert(info.getAs[String]("content") == body2)
    val resp = rows(1)
    assert(resp.getAs[String]("warc_type") == "response")
    assert(resp.getAs[String]("target_uri") == "http://example.com/")
    assert(resp.getAs[Long]("content_length") == body1.length.toLong)

    val html = Warc.htmlResponses(df).select("outlinks").as[Seq[String]].head()
    assert(html == Seq("http://example.com/x"))
  }

  test("warc framing is byte-accurate with multibyte content") {
    // body1 contains multibyte UTF-8: its byte length (Content-Length)
    // exceeds its char count, and it embeds a decoy 'WARC/' string —
    // a char-offset parser would misframe record 2 or emit a phantom
    val body1 = "café ümläut — WARC/1.0 decoy 日本語"
    val body2 = "plain second record"
    val b1 = body1.getBytes(StandardCharsets.UTF_8)
    assert(b1.length > body1.length) // the test premise: multibyte
    val rec1 = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:m1>\r\n" +
      s"Content-Length: ${b1.length}\r\n\r\n"
    val rec2 = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:m2>\r\n" +
      s"Content-Length: ${body2.length}\r\n\r\n$body2"
    val bytes = rec1.getBytes(StandardCharsets.UTF_8) ++ b1 ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8) ++ rec2.getBytes(StandardCharsets.UTF_8)
    val rows = Warc.parseStream("p", bytes).toSeq
    assert(rows.map(_.getString(3)) == Seq("<urn:uuid:m1>", "<urn:uuid:m2>"))
    assert(rows.head.getString(6) == body1)
    assert(rows(1).getString(6) == body2)
  }

  test("warc parser handles gzip files") {
    val body = "hello"
    val warc =
      s"""WARC/0.18\r
         |WARC-Type: response\r
         |WARC-Target-URI: http://a/\r
         |WARC-Record-ID: <urn:uuid:ccc>\r
         |Content-Length: ${body.length}\r
         |\r
         |$body""".stripMargin
    val dir = Files.createTempDirectory("warcgz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("t.warc.gz")))
    out.write(warc.getBytes(StandardCharsets.UTF_8)); out.close()
    val df = Warc.read(spark, dir.toString)
    assert(df.count() == 1)
    assert(df.select("content").as[String].head() == body)
  }

  test("z-order layout: lossless, and 2-D slices cluster into fewer files") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val n = 8
    val z = ZOrderedCorpus.docsZOrdered(spark, dir, numFiles = n)
    val base = spark.read.parquet(s"$dir/documents.parquet")
    // lossless: same rows, any order
    assert(z.count() == base.count())
    assert(z.select("doc_id").except(base.select("doc_id")).isEmpty)
    // clustering: a 2-D range slice touches FEWER files than under a
    // hash-distributed layout with the same file count (the property
    // that makes parquet min/max skipping effective)
    val hashOut = Files.createTempDirectory("hashlayout").toString
    base.repartition(n, col("doc_id")).write.mode("overwrite").parquet(hashOut)
    val pred = col("n_chars").between(300, 600) and col("doc_id") < 200
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.where(pred).select(input_file_name()).distinct().count()
    val zf = filesTouched(spark.read.parquet(ZOrderedCorpus.layoutPath(dir)))
    val hf = filesTouched(spark.read.parquet(hashOut))
    assert(zf < hf, s"z-order files $zf !< hash files $hf")
    // morton code basics: interleave is monotone in each dim's bits
    val m = base.limit(1).select(
      ZOrderedCorpus.morton16(lit(3), lit(0)),
      ZOrderedCorpus.morton16(lit(0), lit(3)),
      ZOrderedCorpus.morton16(lit(65535), lit(65535))).head()
    assert(m.getLong(0) == 5L)        // bits of a at even positions
    assert(m.getLong(1) == 10L)       // bits of b at odd positions
    assert(m.getLong(2) == 0xFFFFFFFFL)
  }

  test("compaction merges a fragmented corpus losslessly and restores skipping") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val fragmented = Files.createTempDirectory("frag").toString
    base.repartition(64).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 64)
    val compacted = Files.createTempDirectory("compact").toString
    // target sized so the tiny fixture lands in very few files
    ZOrderedCorpus.compact(spark, fragmented, compacted, sortCol = "doc_id",
      targetFileBytes = 64L * 1024 * 1024)
    assert(parquetFiles(compacted) < 64, "compaction must reduce file count")
    val re = spark.read.parquet(compacted)
    assert(re.count() == base.count())
    assert(re.select("doc_id").except(base.select("doc_id")).isEmpty)
    // sort restored: a doc_id point predicate touches one file
    val touched = re.where(col("doc_id") === 42L)
      .select(input_file_name()).distinct().count()
    assert(touched == 1L)
  }

  test("warc url fixture round trip recovers the synthetic URL surface") {
    // crawl→curation wiring: the generated multi-record WARC fixture,
    // parsed back through read → htmlResponses → docUrls, must yield
    // byte-identical (doc_id, url, outlinks) to the synthetic table —
    // the contract that lets warc_url_dedup/warc_domain_stats share
    // the dedup_url/domain_stats oracles verbatim
    val sfDir = "/root/testdata/sf0.001"
    val fixture = Warc.urlFixtureDir(spark, sfDir)
    val fromWarc = Warc.docUrls(Warc.read(spark, fixture))
    val synth = graft.pipeline.Urls.urlTable(spark, sfDir)
    assert(fromWarc.count() == synth.count())
    // multi-file: the fixture must exercise the one-task-per-file path
    assert(new java.io.File(fixture).listFiles()
      .count(_.getName.endsWith(".warc.gz")) > 1)
    import org.apache.spark.sql.functions.col
    val mismatched = fromWarc.as("w").join(synth.as("s"), "doc_id")
      .where(col("w.url") =!= col("s.url") ||
        col("w.outlinks") =!= col("s.outlinks"))
    assert(mismatched.isEmpty, "WARC round trip drifted from the generator")
  }
}
