package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: runs one named SparkEntry query against a
  * given sf dir, printing timing and the formatted physical plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // bounded top-k aggregates (TopKAgg) over thousands of groups:
      // the 128-key default forces the sort-based object-agg fallback,
      // which serializes each group buffer per row (measured 155s /
      // 7.3GB spill on a 3.7M-row seed aggregate, SCALE.md r15)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROFILE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROFILE_JOBS=1: per-job wall-clock breakdown (submission->end)
    if (sys.env.get("PROFILE_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (j.time,
            Option(j.properties.getProperty("spark.job.description"))
              .orElse(Option(j.properties.getProperty("callSite.short")))
              .getOrElse("?")))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, desc) = starts.getOrDefault(j.jobId, (j.time, "?"))
          println(f"[job] ${j.jobId}%3d ${(j.time - t0) / 1e3}%7.2f s  ${desc.take(110)}")
        }
      })
    }
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (sys.env.get("PROFILE_EXPLAIN").contains("1")) df.explain("formatted")
    // PROFILE_PLAN=1: isolate driver-side plan time — rebuild the
    // DataFrame fresh each round and time executedPlan resolution
    if (sys.env.get("PROFILE_PLAN").contains("1")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val d2 = graft.SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        d2.queryExecution.executedPlan
        println(f"[plan] $name round $i: build ${(t1 - t0) / 1e9}%.2f s, " +
          f"plan ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    val useNoop = sys.env.get("PROFILE_NOOP").contains("1")
    for (i <- 1 to sys.env.getOrElse("PROFILE_RUNS", "2").toInt) {
      val t0 = System.nanoTime()
      val n = if (useNoop) { df.write.format("noop").mode("overwrite").save(); -1L }
        else df.count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
