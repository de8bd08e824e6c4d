package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive) source (reference: the CMU Lemur
  * edu/cmu/lemurproject Java InputFormat family —
  * WarcFileInputFormat.java:52-57 marks WARC files unsplittable,
  * WarcRecord.java:263-308 parses WARC/0.18 headers+content).
  *
  * Spark-first shape: `binaryFile` reads each (gzipped) WARC file as
  * one partition-local blob — the same unsplittable-file contract —
  * and a per-partition parser walks WARC records without ever
  * collecting to the driver. One row per record: (path, warc_type,
  * target_uri, record_id, content_type, content_length, content).
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("content", StringType)))

  /** Parses one WARC stream (already decompressed) into records.
    * Handles WARC/1.0 and WARC/0.18 header layouts: a version line,
    * header lines until blank, then `Content-Length` bytes of body.
    *
    * Record framing is done over the RAW BYTES (as the reference's
    * WarcRecord.java does): `Content-Length` is a byte count, so
    * applying it to a decoded string misframes any record whose body
    * contains multibyte UTF-8. Headers are ASCII by spec; the body
    * slice alone is decoded to text. */
  private[sources] def parseStream(path: String, bytes: Array[Byte]): Iterator[Row] = {
    val magic = "WARC/".getBytes(StandardCharsets.US_ASCII)
    val crlf2 = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val lf2 = "\n\n".getBytes(StandardCharsets.US_ASCII)
    def indexOfUntil(pat: Array[Byte], from: Int, until: Int): Int = {
      var i = math.max(from, 0)
      val last = math.min(until, bytes.length) - pat.length
      while (i <= last) {
        var j = 0
        while (j < pat.length && bytes(i + j) == pat(j)) j += 1
        if (j == pat.length) return i
        i += 1
      }
      -1
    }
    def indexOf(pat: Array[Byte], from: Int): Int =
      indexOfUntil(pat, from, bytes.length)
    val recs = scala.collection.mutable.ArrayBuffer.empty[Row]
    var i = 0
    while (i < bytes.length) {
      val start = indexOf(magic, i)
      if (start < 0) { i = bytes.length }
      else {
        // header ends at the first blank line, whichever EOL style.
        // The LF-only search is bounded by the CRLF hit: an unbounded
        // scan would walk to stream end for every CRLF-framed record
        // whose body never contains \n\n (quadratic over the chunk).
        val a = indexOf(crlf2, start)
        val b =
          if (a < 0) indexOf(lf2, start)
          else indexOfUntil(lf2, start, a + lf2.length)
        val (headerEnd, sepLen) =
          if (a < 0 && b < 0) (-1, 0)
          else if (a < 0) (b, lf2.length)
          else if (b < 0 || a <= b) (a, crlf2.length)
          else (b, lf2.length)
        if (headerEnd < 0) { i = bytes.length }
        else {
          val header = new String(bytes, start, headerEnd - start, StandardCharsets.UTF_8)
          val fields = header.linesIterator.drop(1).flatMap { l =>
            val c = l.indexOf(':')
            if (c > 0) Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
            else None
          }.toMap
          val len = fields.get("content-length").flatMap(s => s.toLongOption).getOrElse(0L)
          val bodyStart = headerEnd + sepLen
          val bodyEnd = math.min(bodyStart + len, bytes.length.toLong).toInt
          recs += Row(
            path,
            fields.getOrElse("warc-type", fields.getOrElse("warc-record-type", "")),
            fields.getOrElse("warc-target-uri", ""),
            fields.getOrElse("warc-record-id", ""),
            fields.getOrElse("content-type", ""),
            len,
            new String(bytes, bodyStart, bodyEnd - bodyStart, StandardCharsets.UTF_8))
          i = math.max(bodyEnd, start + 1)
        }
      }
    }
    recs.iterator
  }

  private def maybeGunzip(path: String, bytes: Array[Byte]): Array[Byte] =
    if (path.endsWith(".gz") ||
      (bytes.length > 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)) {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else bytes

  /** Reads WARC files under `path` (plain or .gz). One task per file
    * (the unsplittable contract); records stream out of the parser
    * per partition. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val p = r.getString(0)
          parseStream(p, maybeGunzip(p, r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** HTML response records with outlinks extracted by regex
    * (reference: WarcHTMLResponseRecord.java:84-104,168-200). The
    * scheme match is case-insensitive — crawled HTML carries
    * `HTTP://` links too, and the reference's Java URI handling is
    * scheme-case-blind; canonicalization downstream lowercases. */
  def htmlResponses(warc: DataFrame): DataFrame =
    warc.where(col("warc_type") === "response")
      .withColumn("outlinks",
        array_distinct(expr(
          raw"""regexp_extract_all(content, '(?i)href="(https?://[^"]+)"', 1)""")))

  // ------------------------------------------------------------------
  // Deterministic corpus-scale WARC fixture (crawl -> curation wiring)
  // ------------------------------------------------------------------

  /** Build-once registry of generated fixture dirs, keyed by sf dir +
    * source-parquet content signature ([[CorpusRegistry.signature]]):
    * both the in-memory entry AND the on-disk fixture path embed the
    * signature, so a regenerated documents.parquet — or a different
    * corpus sharing a basename — can never silently reuse a stale
    * fixture left in java.io.tmpdir by an earlier JVM. */
  private val fixtureCache = scala.collection.mutable.Map.empty[String, String]

  /** A deterministic multi-record WARC fixture at corpus scale: one
    * `response` record per document, target-URI and HTML `href`
    * outlinks taken from the SAME doc_id arithmetic the synthetic URL
    * table uses ([[graft.pipeline.Urls.withUrlColumns]]), so the
    * DuckDB oracles for the URL surface hold verbatim over the WARC
    * round trip. Written once per sf dir as `files` gzipped WARC
    * files (the unsplittable one-task-per-file contract) under the
    * JVM temp dir; generation is fully distributed (one executor-side
    * write per partition, no driver collect). Test scaffolding only —
    * a real deployment points [[read]] at actual crawl output. */
  def urlFixtureDir(spark: SparkSession, sfDir: String, files: Int = 4): String =
    fixtureCache.synchronized {
      val tag = CorpusRegistry.signature(s"$sfDir/documents.parquet")
      fixtureCache.getOrElseUpdate(s"$sfDir@$tag", {
        val name = s"${new java.io.File(sfDir).getName}_$tag"
        val out = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft_warc_fixture"),
          name).getAbsolutePath
        val marker = new java.io.File(out, "_SUCCESS")
        if (!marker.exists()) {
          writeUrlFixture(spark, sfDir, out, files)
          marker.getParentFile.mkdirs()
          marker.createNewFile()
        }
        out
      })
    }

  private def writeUrlFixture(spark: SparkSession, sfDir: String,
      outDir: String, files: Int): Unit = {
    val dir = new java.io.File(outDir)
    if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
    val docs = graft.pipeline.Urls
      .withUrlColumns(spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), col("url"), col("outlinks"))
    // HTTP response payload: header + HTML with one <a href> per
    // outlink. All ASCII, so Content-Length in characters IS the
    // byte count the parser frames by. The hrefs coalesce to "": a
    // doc with fewer than two outlinks must degrade to an empty link
    // (htmlResponses' href regex skips it), not null the whole
    // concat and NPE the partition writer.
    val body = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
      lit("<html><head><title>doc "), col("doc_id"),
      lit("</title></head><body>\n<a href=\""),
      coalesce(element_at(col("outlinks"), 1), lit("")),
      lit("\">l1</a>\n<a href=\""),
      coalesce(element_at(col("outlinks"), 2), lit("")),
      lit("\">l2</a>\n</body></html>"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:doc:"),
      col("doc_id"),
      lit(">\r\nWARC-Target-URI: "), col("url"),
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      length(col("body")), lit("\r\n\r\n"), col("body"), lit("\r\n\r\n"))
    docs.withColumn("body", body)
      .repartition(files, col("doc_id"))
      .select(rec.as("rec"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .foreachPartition { (it: Iterator[String]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$outDir/part-$pid.warc.gz")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val gz = new java.util.zip.GZIPOutputStream(fs.create(path, true))
        try it.foreach(s => gz.write(s.getBytes(StandardCharsets.UTF_8)))
        finally gz.close()
      }
  }

  /** Recovers the per-document URL surface from fixture WARC records:
    * doc_id parsed back out of the record id, url = the response's
    * target URI, outlinks = the hrefs extracted from the HTML body by
    * [[htmlResponses]]. This is the crawl-side producer the URL
    * operators ([[graft.pipeline.Urls]]) consume. */
  def docUrls(warc: DataFrame): DataFrame =
    htmlResponses(warc).select(
      regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long").as("doc_id"),
      col("target_uri").as("url"),
      col("outlinks"))
}
