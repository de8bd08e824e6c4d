package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered (Morton space-filling-curve) corpus layout — the
  * multi-dimensional clustering technique behind Delta Lake's
  * `OPTIMIZE ... ZORDER BY` and ClickHouse/Databricks data skipping:
  * interleave the bits of two normalized sort dimensions, range-
  * partition and sort files by the interleaved value, and every file
  * covers a small RECTANGLE of the 2-D key space instead of a thin
  * slice of one dimension. Parquet footer min/max statistics on BOTH
  * columns then stay tight per file/row-group, so a conjunctive range
  * predicate on either (or both) dimensions skips most of the corpus —
  * a single-column sort gives that for one dimension only.
  *
  * Scale shape: normalization bounds come from ONE corpus aggregate
  * (2 doubles to the driver), the z-value is pure codegen bit
  * arithmetic, and the write is one range shuffle (reservoir-sampled
  * bounds) — the same cost as any sorted write at 100 TB.
  */
object ZOrderedCorpus {

  /** Interleaves the low 16 bits of two non-negative int columns into
    * a 32-bit Morton code (a's bits at even positions). The classic
    * shift-and-mask bit spread, as codegen'd long arithmetic. */
  def morton16(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
      x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
      (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Linear [0, 65535] normalization of a numeric column given its
    * corpus min/max (degenerate range maps to 0). */
  private def rank16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0)
    else least(greatest(
      (((c.cast("double") - lo) / (hi - lo)) * 65535.0).cast("int"),
      lit(0)), lit(65535))

  /** Writes `df` z-ordered on two numeric dimensions into `numFiles`
    * range-partitioned parquet files sorted by the Morton code. */
  def write(df: DataFrame, out: String, dimA: String, dimB: String,
      numFiles: Int): Unit = {
    val b = df.agg(
      min(col(dimA)).cast("double"), max(col(dimA)).cast("double"),
      min(col(dimB)).cast("double"), max(col(dimB)).cast("double")).head()
    val z = morton16(
      rank16(col(dimA), b.getDouble(0), b.getDouble(1)),
      rank16(col(dimB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  private val written = scala.collection.mutable.Set.empty[String]

  /** Idempotent per-corpus fixture path, keyed by BOTH the corpus dir
    * and the file count — same convention as lshCache's "$dir#$n" key,
    * so a second same-JVM call with a different `numFiles` writes a
    * fresh layout instead of silently returning the first one's. */
  def layoutPath(dir: String, numFiles: Int = 8): String =
    s"/tmp/graft_fixtures/zorder_docs_${dir.replaceAll("[^A-Za-z0-9.]", "_")}_f$numFiles"

  /** Write-once z-ordered layout of the documents table on
    * (doc_id, n_chars) — an identity dimension and a content
    * dimension, so both point lookups and length-band scans skip. */
  def docsZOrdered(spark: SparkSession, dir: String,
      numFiles: Int = 8): DataFrame = {
    val out = layoutPath(dir, numFiles)
    written.synchronized {
      if (!written.contains(out)) {
        write(spark.read.parquet(s"$dir/documents.parquet"), out,
          dimA = "doc_id", dimB = "n_chars", numFiles = numFiles)
        written += out
      }
    }
    spark.read.parquet(out)
  }

  /** Small-file compaction — the maintenance pass every long-lived
    * 100 TB corpus needs after incremental ingest fragments it
    * (thousands of per-micro-batch files kill scan throughput via
    * open/seek overhead and tiny row groups). Rewrites the input as
    * `ceil(totalBytes / targetFileBytes)` range-partitioned files
    * sorted on `sortCol`, restoring both file sizing AND min/max
    * skipping on the sort key. Sizing uses the files' own on-disk
    * footprint (one driver-side listing, no data pass); the rewrite
    * is one range shuffle, the same cost class as any sorted write. */
  def compact(spark: SparkSession, in: String, out: String,
      sortCol: String, targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    // Size the input through the Hadoop FileSystem API so the
    // maintenance pass works on hdfs:// and s3a:// URIs, not just the
    // local FS (getContentSummary = one recursive NameNode/listing
    // call, no data read). Non-parquet sidecar files (_SUCCESS, CRCs)
    // are noise at the 128 MB target-file granularity.
    val totalBytes = {
      val p = new org.apache.hadoop.fs.Path(in)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(in)
      .repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(out)
    numFiles
  }

  /** Write-once fragment-then-compact fixture of the documents table
    * (the `source_compacted` entry's corpus): fragmented to 64 files
    * first, then compacted on doc_id — so the entry reads the
    * compacted output of a genuinely fragmented input. */
  def docsCompacted(spark: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_fixtures/compact_docs_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    written.synchronized {
      if (!written.contains(out)) {
        val frag = out + "_frag"
        spark.read.parquet(s"$dir/documents.parquet")
          .repartition(64).write.mode("overwrite").parquet(frag)
        compact(spark, frag, out, sortCol = "doc_id")
        written += out
      }
    }
    spark.read.parquet(out)
  }
}
