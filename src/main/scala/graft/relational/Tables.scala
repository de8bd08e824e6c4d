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
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalizes an events frame's `ts` to TimestampType (see the
    * flavor list above) — the single implementation shared by this
    * batch loader and the streaming `stagedEvents` staging, so the
    * two paths cannot drift on the next testdata-format change.
    *
    * The NTZ→Timestamp cast is an identity on the stored micros ONLY
    * in a UTC session; a session built elsewhere would silently shift
    * event timestamps and diverge from the DuckDB oracles, so the
    * session timezone is asserted here, where the cast happens. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
          s"events ts is TIMESTAMP_NTZ and the session timezone is '$tz': " +
            "the cast to TimestampType is only value-preserving under UTC — " +
            "set spark.sql.session.timeZone=UTC on this SparkSession")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
