package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage barriers for long-lived engine frames (shared by the
  * search index and the pipeline registries).
  *
  * A bare `persist` keeps the builder's full logical lineage inside
  * the InMemoryRelation: every query referencing the frame re-embeds
  * that subtree in its plan (driver planning/AQE re-planning walk it
  * per stage) and every task serializes the narrow RDD chain behind
  * the cache (measured 60-300 ms of PER-TASK deserialize on the r16
  * query-join profile). `cutLineage` materializes the frame once via
  * eager localCheckpoint, so every downstream plan sees one LEAF and
  * task closures stay flat. Trade-off (documented localCheckpoint
  * contract): the blocks do not recompute on executor loss — HA
  * deployments persist such frames to storage and reload instead.
  */
object Frames {

  /** Materialize `df` behind a lineage barrier (see object doc). */
  def cutLineage(df: DataFrame, storageLevel: StorageLevel): DataFrame =
    df.localCheckpoint(true, storageLevel)

  /** The checkpointed RDD behind a [[cutLineage]] frame, if any. */
  def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Release a frame whether cache-persisted or lineage-cut
    * (Dataset.unpersist is a no-op on a checkpointed frame — the
    * blocks belong to the RDD). */
  def release(df: DataFrame, blocking: Boolean): Unit = {
    df.unpersist(blocking)
    checkpointedRdd(df).foreach(_.unpersist(blocking))
  }
}
