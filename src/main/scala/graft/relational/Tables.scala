package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central parquet table loader for the driver's testdata.
  *
  * The `events` table's `ts` column has arrived in three physical
  * flavors across testdata generations, normalized here so every
  * downstream query sees one TimestampType schema regardless of the
  * writer or session config:
  *  - parquet TIMESTAMP(NANOS), readable only under
  *    `spark.sql.legacy.parquet.nanosAsLong=true` → nanosecond LongType;
  *  - naive `timestamp[us]` (isAdjustedToUTC=false), which Spark 4
  *    reads as TIMESTAMP_NTZ under the default
  *    `spark.sql.parquet.inferTimestampNTZ.enabled=true` — cast to
  *    TimestampType (sessions here run UTC, so the cast is identity on
  *    the stored micros, matching DuckDB's naive-timestamp reading);
  *  - UTC-adjusted micros → TimestampType already.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }
}
