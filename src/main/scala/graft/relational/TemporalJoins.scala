package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins expressed as ONE window shuffle instead of a join.
  *
  * An as-of join ("for each left row, the latest right row at or
  * before its timestamp, per key") is the point-in-time lookup every
  * event pipeline needs — attribution, feature backfill, slowly
  * changing dimensions. Naive formulations explode: an inequality
  * join (`l.key = r.key AND r.ts <= l.ts`) produces |matches|² rows
  * per key before the per-row max, and Spark plans non-equi
  * conditions as a broadcast-nested-loop unless the equi key carries
  * it. The scale-right shape is the union trick: tag both sides,
  * union them into one (key, ts)-sorted stream, and carry the right
  * side's columns forward with `last(_, ignoreNulls = true)` over a
  * rows-frame window. One hash shuffle on the key, linear scan per
  * partition, zero row amplification — the same plan at sf0.001 and
  * at 100 TB (per-key history length, not corpus size, bounds a
  * window partition; a year-scale corpus would add time-slicing with
  * per-slice carry-in, same operator shape).
  *
  * [[rangeCount]] is the companion interval aggregate: "for each left
  * row, aggregate right rows within [ts - horizon, ts]" via a RANGE
  * frame over the unioned stream — again one shuffle and no join
  * node at all, where the join formulation would amplify by the
  * per-window match count.
  */
object TemporalJoins {

  /** As-of join `left` to `right` on equal `keys` with
    * `right.tsCol <= left.tsCol` (strictly `<` when `strict`),
    * keeping the LATEST qualifying right row's `valueCols`. Left
    * rows with no qualifying right row keep NULLs (left-outer
    * semantics). Right-side ties on (keys, ts) resolve to the
    * largest `rightOrd` value — pass a unique column to make the
    * result deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], rightOrd: String,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // side ordering at equal ts decides visibility: at-or-before puts
    // right rows first (visible to a same-instant left row); strict
    // puts them after (invisible).
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val l = left
      .withColumn("__side", lit(leftSide))
      .withColumn("__ord", lit(null).cast("long"))
    val r0 = right.select((keys :+ tsCol).map(col) ++
      valueCols.map(c => col(c).as(s"__r_$c")) :+
      col(rightOrd).cast("long").as("__ord"): _*)
      .withColumn("__side", lit(rightSide))
    val lAligned = valueCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(r0.schema(s"__r_$c").dataType))
    }
    val rAligned = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(r0) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = lAligned.unionByName(rAligned)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === leftSide)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__m_$c").as(s"asof_$c")): _*)
  }

  /** For each `left` row: COUNT of `right` rows with equal `keys` and
    * `tsCol` within `[left.ts - horizonMicros, left.ts]`, plus the
    * latest such right timestamp. RANGE frame over epoch micros — the
    * frame is defined by the ts VALUE, so same-instant ordering ties
    * cannot change the aggregate. */
  def rangeCount(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, horizonMicros: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__is_r", lit(0L))
    val r = right.select((keys :+ tsCol).map(col): _*).withColumn("__is_r", lit(1L))
    val unioned = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(r) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }
      .unionByName(l)
      .withColumn("__us", unix_micros(col(tsCol)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__us"))
      .rangeBetween(-horizonMicros, 0)
    unioned
      .withColumn("n_right", sum(col("__is_r")).over(w))
      .withColumn("last_right_us", max(when(col("__is_r") === 1, col("__us"))).over(w))
      .where(col("__is_r") === 0)
      .select(leftCols.map(col) :+ col("n_right") :+ col("last_right_us"): _*)
  }
}
