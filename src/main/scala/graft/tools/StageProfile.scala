package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off stage profiler for chasing scale regressions: runs a single
  * SparkEntry query against a corpus dir with a listener that prints
  * every completed stage's input/shuffle/spill/output volumes, then
  * prints the final formatted plan. The spill columns answer "which
  * stage wrote 60 GB" directly instead of guessing from plan shapes.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <entryName>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StageProfile <sfDir> <entryName>")
    val Array(dir, entry) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // bounded top-k aggregates (TopKAgg) over thousands of groups:
      // the 128-key default forces the sort-based object-agg fallback,
      // which serializes each group buffer per row (measured 155s /
      // 7.3GB spill on a 3.7M-row seed aggregate, SCALE.md r15)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gb(b: Long) = f"${b / 1e9}%.2f"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m.inputMetrics.bytesRead + m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten + m.diskBytesSpilled > 50_000_000L)
          println(f"[stage ${i.stageId}%4d] tasks=${i.numTasks}%3d " +
            f"in=${gb(m.inputMetrics.bytesRead)}GB " +
            f"shR=${gb(m.shuffleReadMetrics.totalBytesRead)}GB " +
            f"shRrec=${m.shuffleReadMetrics.recordsRead} " +
            f"shW=${gb(m.shuffleWriteMetrics.bytesWritten)}GB " +
            f"shWrec=${m.shuffleWriteMetrics.recordsWritten} " +
            f"spillMem=${gb(m.memoryBytesSpilled)}GB " +
            f"spillDisk=${gb(m.diskBytesSpilled)}GB " +
            f"ms=${m.executorRunTime} :: ${i.name.take(80)}")
      }
    })
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(entry)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f sec")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
