package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** SparkEntry entries for the ingest sources (SURVEY §2.1): the
  * Wikipedia XML dump reader, the corpus parquet round-trip, and the
  * WARC reader — each driven end-to-end over a deterministic fixture
  * and hash-checked against a VALUES oracle that pins the expected
  * parse output (the sf parquet tables cannot carry raw XML/WARC
  * bytes, so the fixture IS the input contract; reference input
  * shapes: utils/WikipediaXmlDumpParser.scala:46-114,
  * edu/cmu/lemurproject/WarcRecord.java:310-330).
  */
object SourceQueries {

  // ------------------------------------------------------------------
  // fixtures (deterministic content, written once per process)
  // ------------------------------------------------------------------

  private val wikiPages = Seq(
    (42L, "Island", "An island is land surrounded by water."),
    (43L, "Lake", "A lake is water surrounded by land."),
    (44L, "River", "A river flows from high ground to low ground."))

  private val warcBody1 = "<html><body><a href=\"http://example.com/x\">x</a></body></html>"
  private val warcBody2 = "software: graft-fixture/1.0"

  private def writeFixture(name: String, content: Array[Byte]): String = synchronized {
    val p = Paths.get(s"/tmp/graft_fixtures/$name")
    Files.createDirectories(p.getParent)
    // unconditional (a stale /tmp file from a previous build would
    // otherwise mask edits to the in-code fixture constants), but via
    // temp-file + atomic move: an in-place truncate-and-rewrite could
    // expose a partial file to a concurrently executing Spark task
    if (!Files.exists(p) || !java.util.Arrays.equals(Files.readAllBytes(p), content)) {
      val tmp = Files.createTempFile(p.getParent, p.getFileName.toString, ".tmp")
      Files.write(tmp, content)
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    p.toString
  }

  private def wikiXmlPath: String = {
    val xml = "<mediawiki>" + wikiPages.map { case (id, t, x) =>
      s"<page><title>$t</title><ns>0</ns><id>$id</id><revision><text>$x</text></revision></page>"
    }.mkString("\n") + "</mediawiki>"
    writeFixture("wiki/dump.xml", xml.getBytes(UTF_8))
  }

  private def warcDirPath: String = {
    val warc =
      s"""WARC/1.0\r
         |WARC-Type: warcinfo\r
         |WARC-Record-ID: <urn:uuid:fixture-info>\r
         |Content-Type: application/warc-fields\r
         |Content-Length: ${warcBody2.getBytes(UTF_8).length}\r
         |\r
         |${warcBody2}WARC/1.0\r
         |WARC-Type: response\r
         |WARC-Target-URI: http://example.com/\r
         |WARC-Record-ID: <urn:uuid:fixture-resp>\r
         |Content-Type: text/html\r
         |Content-Length: ${warcBody1.getBytes(UTF_8).length}\r
         |\r
         |$warcBody1""".stripMargin
    val f = writeFixture("warc/fixture.warc", warc.getBytes(UTF_8))
    Paths.get(f).getParent.toString
  }

  // ------------------------------------------------------------------
  // entries
  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Wikipedia XML dump -> (title, text, ns, page_id) rows
    "source_wiki_xml" -> ((s, _) =>
      WikipediaXml.readPages(s, wikiXmlPath)
        .select("title", "text", "ns", "page_id")
        .orderBy("page_id")),

    // parse -> writeCorpus (parquet sink) -> readCorpus: the dump-
    // parser sink + corpus persist/reload round trip; same oracle as
    // the direct read — the round trip must be lossless
    "source_wiki_roundtrip" -> ((s, _) => {
      val out = "/tmp/graft_fixtures/wiki_corpus"
      WikipediaXml.writeCorpus(WikipediaXml.readPages(s, wikiXmlPath), out, numFiles = 1)
      WikipediaXml.readCorpus(s, out)
        .select("title", "text", "ns", "page_id")
        .orderBy("page_id")
    }),

    // hive-partitioned corpus layout: write documents partitioned by
    // lang (+ in-file doc_id ordering), read back with a partition
    // filter — the driver prunes to one subtree before any task runs
    // (PlanShapeSpec pins PartitionFilters on the scan); the round
    // trip must be lossless per partition
    "source_partitioned" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      PartitionedCorpus.docsByLang(s, dir)
        .where(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    }),

    // z-ordered corpus layout: 2-D range predicate over the Morton-
    // clustered files; the round trip must be lossless (the layout
    // only moves rows between files). The clustering claim — matching
    // rows concentrate in few files — is asserted in LayoutSpec.
    "source_zorder" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      ZOrderedCorpus.docsZOrdered(s, dir)
        .where(col("n_chars").between(300, 600) and col("doc_id") < 200)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),

    // fragment-then-compact maintenance pass: the compacted corpus
    // must be lossless (SourcesSpec asserts the file-count and
    // point-lookup-skipping claims)
    "source_compacted" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      ZOrderedCorpus.docsCompacted(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),

    // WARC file -> framed records with headers and bodies
    "source_warc" -> ((s, _) =>
      Warc.read(s, warcDirPath)
        .select("warc_type", "target_uri", "record_id", "content_type",
          "content_length", "content")
        .orderBy("record_id")))

  // ------------------------------------------------------------------
  // oracles: VALUES rows pinning the expected parse
  // ------------------------------------------------------------------

  private def sq(s: String) = s.replace("'", "''")

  val oracles: Map[String, String] = {
    val wikiValues = wikiPages.map { case (id, t, x) =>
      s"('${sq(t)}', '${sq(x)}', CAST(0 AS BIGINT), CAST($id AS BIGINT))"
    }.mkString(",\n  ")
    val wikiSql =
      s"""SELECT * FROM (VALUES
         |  $wikiValues) AS t(title, text, ns, page_id)
         |ORDER BY page_id""".stripMargin
    val warcSql =
      s"""SELECT * FROM (VALUES
         |  ('warcinfo', '', '<urn:uuid:fixture-info>',
         |   'application/warc-fields', CAST(${warcBody2.getBytes(UTF_8).length} AS BIGINT), '${sq(warcBody2)}'),
         |  ('response', 'http://example.com/', '<urn:uuid:fixture-resp>',
         |   'text/html', CAST(${warcBody1.getBytes(UTF_8).length} AS BIGINT), '${sq(warcBody1)}')
         |) AS t(warc_type, target_uri, record_id, content_type, content_length, content)
         |ORDER BY record_id""".stripMargin
    Map(
      "source_wiki_xml" -> wikiSql,
      "source_wiki_roundtrip" -> wikiSql,
      "source_warc" -> warcSql,
      // the layout round trip must be lossless: per-source stats of
      // the lang='en' partition equal the unpartitioned table's
      "source_partitioned" ->
        """SELECT source, count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM documents WHERE lang = 'en'
          |GROUP BY source ORDER BY source""".stripMargin,
      // the z-order round trip is lossless: the 2-D range slice of
      // the clustered layout equals the unclustered table's
      "source_zorder" ->
        """SELECT lang, count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM documents WHERE n_chars BETWEEN 300 AND 600 AND doc_id < 200
          |GROUP BY lang ORDER BY lang""".stripMargin,
      // compaction is pure layout: per-lang stats of the compacted
      // corpus equal the original table's
      "source_compacted" ->
        """SELECT lang, count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  min(doc_id) AS min_id, max(doc_id) AS max_id
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
  }
}
