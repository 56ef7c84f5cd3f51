package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * `rightTime <= leftTime` within the same key — an operator Spark lacks
  * natively (SURVEY §2.7 lists it as a Catalyst-native gap worth filling).
  *
  * Implemented as union + per-key window scan, NOT a range theta-join:
  * both sides are tagged, unioned, and sorted per key by (time, side);
  * a running `last(right_id, ignoreNulls)` carries the most recent right
  * row forward onto every left row. One shuffle on the key, O(n log n)
  * per-key sort, zero pair explosion — the shape that survives 100 TB
  * (a theta `t_r <= t_l` join would be quadratic per key).
  *
  * Ties: a right row at exactly leftTime matches (<=); among equal right
  * times the largest `rightId` wins (deterministic tie-break).
  */
object AsOfJoin {

  /** @param left  frame with `keyCol`, `leftTime`, plus `leftId` to carry
    * @param right frame with `keyCol`, `rightTime`, plus `rightId` to carry
    * @return left rows with `matched_<rightId>` (null when no right row
    *         precedes) and `asof_lag` = leftTime - matched rightTime */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String,
           leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(keyCol), col(leftTime).as("_t"),
      col(leftId).as("_lid"), lit(1).as("_side"))
    val r = right.select(col(keyCol), col(rightTime).as("_t"),
      col(rightId).as("_lid"), lit(0).as("_side"))
    // right rows sort before left rows at equal times so `<=` matches
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_t").asc, col("_side").asc, col("_lid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .withColumn("_last_r", last(when(col("_side") === 0, col("_lid")), ignoreNulls = true).over(w))
      .withColumn("_last_rt", last(when(col("_side") === 0, col("_t")), ignoreNulls = true).over(w))
    merged.filter(col("_side") === 1)
      .select(col(keyCol), col("_lid").as(leftId), col("_t").as(leftTime),
        col("_last_r").as(s"matched_$rightId"),
        (col("_t") - col("_last_rt")).as("asof_lag"))
  }
}
