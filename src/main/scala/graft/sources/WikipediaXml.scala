package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wikipedia XML dump source (reference:
  * utils/WikipediaXmlDumpParser.scala:46-114 — there a hand-rolled
  * XMLEventReader state machine over spark-xml's XmlInputFormat;
  * here Spark 4's built-in splittable XML data source does the
  * record splitting and parsing, keeping the read distributed and
  * pushdown-capable).
  */
object WikipediaXml {

  /** Reads `pages-articles` style dumps into (title, text, ns, id).
    * The `<page>` rowTag split is performed in parallel across input
    * splits — same parallelism model as the reference's
    * XmlInputFormat, no driver-side parsing. */
  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read
      .format("xml")
      .option("rowTag", "page")
      .load(path)
      .select(
        col("title").cast("string").as("title"),
        col("revision.text").cast("string").as("text"),
        coalesce(col("ns").cast("long"), lit(0L)).as("ns"),
        col("id").cast("long").as("page_id"))

  /** Parsed corpus sink (reference: WikipediaXmlDumpParser.scala:22-37
    * writes `coalesce(50).saveAsObjectFile`; parquet is the columnar
    * equivalent with schema + predicate pushdown on reload). */
  def writeCorpus(df: DataFrame, out: String, numFiles: Int = 50): Unit =
    df.coalesce(numFiles).write.mode("overwrite").parquet(out)

  /** Corpus reload round-trip (reference: examples/StoreableExample.
    * scala:22-30 objectFile reload). */
  def readCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
