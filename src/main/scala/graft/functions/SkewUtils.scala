package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling utilities for the 100 TB path.
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting remains the tool when one side must be aggregated first
  * (e.g. per-term posting lists where a stop-word-like term holds a
  * double-digit percentage of all postings).
  */
object SkewUtils {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt
    * in [0, nSalts) derived from its row content; the small side is
    * replicated nSalts times. The join key becomes (key, salt), so one
    * hot key spreads over nSalts reducers. Semantics are identical to
    * `big.join(small, keys)` for inner joins.
    *
    * @param saltBy columns of the big side used to derive the salt
    *   (use a high-cardinality payload column, not the join key)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int, saltBy: Seq[Column]): DataFrame = {
    require(nSalts > 0)
    val salted = big.withColumn("__salt", pmod(hash(saltBy: _*), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for skewed keys — partial
    * aggregate on (key, salt), then final aggregate on key. Use for
    * algebraic aggregates (sum/count/min/max) when a single group is
    * too large for one reducer even after map-side combine. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }
}
