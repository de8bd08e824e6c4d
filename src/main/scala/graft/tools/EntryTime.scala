package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-entry wall-clock timer for local iteration: runs named
  * SparkEntry queries N times in ONE JVM (separating cold-build from
  * memoized-warm cost — the bench's best-of-2 blends them) and prints
  * per-run seconds plus >150ms stages of the last run.
  *
  * Usage: runMain graft.tools.EntryTime <sfDir> <name,name,...> [reps]
  */
object EntryTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
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
    val qs = graft.SparkEntry.queries
    @volatile var trace = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val dur = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          if (trace && dur > 150)
            println(f"  [stage ${i.stageId}%4d] ${dur}ms tasks=${i.numTasks} " +
              i.name.take(90))
        }
      })
    for (n <- names; r <- 1 to reps) {
      trace = r == reps
      val t0 = System.nanoTime()
      val df = qs(n)(spark, dir)
      val t1 = System.nanoTime()
      val _ = df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val cnt = df.count()
      val t3 = System.nanoTime()
      println(f"$n run$r: build=${(t1 - t0) / 1e9}%.2fs plan=${(t2 - t1) / 1e9}%.2fs exec=${(t3 - t2) / 1e9}%.2fs rows=$cnt")
    }
    spark.stop()
  }
}
