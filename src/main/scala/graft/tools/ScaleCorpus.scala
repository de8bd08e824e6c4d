package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N× scale corpus from a testdata SF dir into a
  * scratch directory — the raw material for MEASURING the scaling
  * curve instead of arguing it from plan shapes (r12 verdict lead
  * item). `/root/testdata` is read-only, so copies land under the
  * given output dir.
  *
  * Copy k (k = 0 is the untouched base):
  *  - documents: `doc_id += k·N`; every token of `text` suffixed
  *    `x<k>` (alphanumeric, so the default analyzer keeps one token
  *    per original token — each copy is a disjoint vocabulary
  *    island, which scales the term dictionary and postings like a
  *    genuinely larger crawl instead of multiplying document
  *    frequencies 16×); `source` suffixed so per-domain stats scale;
  *    `n_chars` recomputed. The doc_id offset shifts the derived
  *    page/link graph to disjoint per-copy subgraphs.
  *  - embeddings: `vec_id += k·M`; for k > 0 the vector decorrelates
  *    from the base by a deterministic per-copy sign pattern
  *    (position-dependent flips) — copies are far apart in cosine,
  *    so ANN/near-dup entries see a larger corpus, not a 16-way
  *    near-duplicate explosion that no real corpus would have.
  *  - events / lineitem-family tables are copied through with key
  *    offsets only where the measured entries need them (events:
  *    event_id/user_id offset, ts shifted by k days so watermarks
  *    and windows see a longer, denser stream).
  *  - region.parquet copies verbatim (the Bench warmup touches it).
  *
  * ZIPF text mode (4th arg `zipf`, r13 verdict #2): instead of
  * suffix-islanding the base tokens — which makes EVERY probe term
  * dense (df = a constant fraction of the corpus) and therefore
  * measures only the worst case — every document's tokens are
  * REDRAWN from a shared power-law vocabulary: token i of doc d maps
  * to rank `V^u` (u = uniform hash of (doc_id, i)), so term density
  * falls off ~1/rank like a real crawl, the vocabulary grows with
  * the corpus (V ~ 10·N^0.8, Heaps-ish), and rarest-term probe
  * alternatives are genuinely df-bounded. Token COUNTS per doc stay
  * the base corpus's, so dl/avgdl distributions carry over. Used by
  * the SCALE.md Zipf appendix to measure the query-join cohort in
  * the regime the 31-term corpus cannot reach.
  *
  * Usage: runMain graft.tools.ScaleCorpus <baseDir> <outDir> <factor> [zipf]
  */
object ScaleCorpus {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleCorpus <baseDir> <outDir> <factor> [zipf]")
    val base = args(0); val out = args(1); val factorS = args(2)
    val zipf = args.length == 4 && args(3) == "zipf"
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, base, out, factor, zipf)
    spark.stop()
  }

  /** The testdata layout is ONE parquet FILE per table (the streaming
    * stagers and fixture tags depend on it) — write through a temp
    * dir and move the single part file into place. */
  private def writeSingleFile(df: DataFrame, dest: String): Unit = {
    val tmp = dest + "__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val destPath = java.nio.file.Paths.get(dest)
    java.nio.file.Files.deleteIfExists(destPath)
    java.nio.file.Files.move(part.toPath, destPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  def synthesize(spark: SparkSession, base: String, out: String,
      factor: Int, zipf: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = 1L + docs.agg(max(col("doc_id"))).head().getLong(0)
    // Zipf vocabulary: V ~ 10 * totalDocs^0.8 (Heaps-ish growth);
    // token i of doc d -> rank floor(V^u), u = hash(d, i) uniform in
    // [0,1) — P(rank <= r) = ln(r)/ln(V), i.e. density ~ 1/r
    val zipfV = math.max(1000L,
      math.ceil(10.0 * math.pow((nDocs * factor).toDouble, 0.8)).toLong)
    def zipfText: org.apache.spark.sql.Column =
      array_join(transform(split(col("text"), " "), (_, i) =>
        concat(lit("z"), greatest(lit(1L),
          floor(pow(lit(zipfV.toDouble),
            pmod(xxhash64(col("doc_id"), i), lit(1000000L)).cast("double")
              / lit(1000000.0))).cast("long")))), " ")
    val docCopies = (0 until factor).map { k =>
      val shifted =
        if (k == 0) docs
        else docs.select(
          (col("doc_id") + k * nDocs).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"x$k"))), " ").as("text"),
          col("lang"),
          concat(col("source"), lit(s"x$k")).as("source"),
          lit(0L).as("n_chars"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      if (!zipf) shifted
      else shifted
        .withColumn("text", zipfText)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    writeSingleFile(docCopies.reduce(_ unionByName _),
      s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val nVecs = 1L + emb.agg(max(col("vec_id"))).head().getLong(0)
    val embCopies = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + k * nVecs).as("vec_id"),
        // deterministic decorrelation: flip signs on a per-copy
        // position pattern (cast preserves float element type)
        transform(col("embedding"), (x, i) =>
          when((i + lit(k)) % 4 < 2, x).otherwise(-x)).as("embedding"),
        col("label"))
    }
    writeSingleFile(embCopies.reduce(_ unionByName _),
      s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$base/events.parquet")
    val nEv = 1L + ev.agg(max(col("event_id"))).head().getLong(0)
    val nUsers = 1L + ev.agg(max(col("user_id"))).head().getLong(0)
    // ts arrives as nanos-LongType, TIMESTAMP_NTZ, or TimestampType
    // depending on the writer (graft.relational.Tables normalizes all
    // three on the read side) — shift each copy by k days in whatever
    // type it came in as, so the written copy keeps the base flavor.
    val tsIsLong = ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    def shiftTs(k: Int) =
      if (tsIsLong) col("ts") + lit(k * 86400L * 1000000000L)
      else col("ts") + expr(s"INTERVAL '${k}' DAY")
    val evCopies = (0 until factor).map { k =>
      if (k == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + k * nEv)
        .withColumn("user_id", col("user_id") + k * nUsers)
        .withColumn("ts", shiftTs(k))
    }
    writeSingleFile(evCopies.reduce(_ unionByName _),
      s"$out/events.parquet")

    // warmup table the Bench main touches
    writeSingleFile(spark.read.parquet(s"$base/region.parquet"),
      s"$out/region.parquet")
    println(s"scale corpus written: $out (${factor}x of $base)")
  }
}
