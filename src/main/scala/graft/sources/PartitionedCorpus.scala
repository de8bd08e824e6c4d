package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned corpus layout — the on-disk shape that makes
  * a 100 TB corpus queryable: directory partitioning on low-cardinality
  * selection columns (lang, source) so a `WHERE lang = 'en'` touches
  * only that subtree (partition pruning happens in the driver BEFORE
  * any task launches), plus within-file ordering on doc_id so min/max
  * row-group statistics prune point lookups inside each file.
  *
  * The write repartitions on the partition columns first: without it,
  * every task writes a file into every partition directory — the
  * classic small-files explosion (tasks x partitions files); with it,
  * each partition's rows land in one task. At a real corpus scale the
  * repartition key would add a bounded salt to cap per-task input
  * (lang skews hard toward 'en'); the layout contract is unchanged.
  */
object PartitionedCorpus {

  def write(df: DataFrame, out: String, partitionCols: Seq[String],
      sortCol: String): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(out)

  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out)

  /** Idempotent per-(corpus, layout) fixture path. */
  def layoutPath(dir: String): String =
    s"/tmp/graft_fixtures/part_docs_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  private val written = scala.collection.mutable.Set.empty[String]

  /** Write-once layout of the documents table partitioned by lang. */
  def docsByLang(spark: SparkSession, dir: String): DataFrame = {
    val out = layoutPath(dir)
    written.synchronized {
      if (!written.contains(out)) {
        write(spark.read.parquet(s"$dir/documents.parquet"), out,
          partitionCols = Seq("lang"), sortCol = "doc_id")
        written += out
      }
    }
    read(spark, out)
  }
}
