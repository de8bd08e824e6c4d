package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Central parquet table loader for the driver's testdata.
  *
  * The `events` table is written with parquet TIMESTAMP(NANOS), which
  * Spark 4 only reads under `spark.sql.legacy.parquet.nanosAsLong=true`
  * (the column then arrives as a nanosecond LongType). We normalize it
  * back to a microsecond TimestampType here so every downstream query
  * sees one schema regardless of which session config is active.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
