package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one JVM, one context). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // match Verify/Bench: events.parquet is TIMESTAMP(NANOS), which
      // Spark 4 only reads under this flag (Tables normalizes back)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the build-time extension route (spark-submit contract):
      // installs the native expressions + the graft_search TVF
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
