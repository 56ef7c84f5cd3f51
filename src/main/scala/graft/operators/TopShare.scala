package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k cumulative-share report — the "top-k + cumulative mass + total"
  * shape that frequency reports (vocab coverage curves, heavy hitters,
  * join-key skew diagnostics) all need: the k heaviest keys of a counts
  * frame, each with its rank, running mass, and the corpus totals to
  * compute shares against.
  *
  * Scale contract: the top-k lands via `orderBy(...).limit(k)` —
  * TakeOrderedAndProject, a bounded per-partition heap merged once —
  * NEVER an unpartitioned Window over the full counts frame (rank+cumsum
  * over an unbounded input plans as `Exchange SinglePartition → Sort →
  * Window`, a one-task sort of the whole vocabulary: the classic
  * 100 TB scale-killer this operator exists to make impossible). The
  * rank / cum-mass window then runs over the k-row result only; the
  * totals aggregate is a constant-size map-side-partial pass broadcast
  * onto the report. Output is bit-identical to the full-frame window
  * form: cumulative mass at ranks 1..k depends only on the top-k rows
  * because the order is total.
  *
  * Determinism: total order (cnt desc, key asc) — ties break on the key,
  * so ranks, cum mass, and the kept set replay in any engine.
  *
  * Output: the counts frame's top-k rows plus `rank` (1-based long),
  * `cum_cnt` (running sum of `cntCol` in rank order), and the totals
  * columns (default: `total` = sum of `cntCol` over the WHOLE frame;
  * callers needing richer totals — key counts, percentiles — pass their
  * own `totalAggs`).
  */
object TopShare {

  def report(
      counts: DataFrame,
      keyCol: String,
      cntCol: String,
      k: Int,
      totalAggs: Seq[Column] = Nil): DataFrame = {
    require(k > 0, s"top-share k must be positive, got $k")
    val aggs =
      if (totalAggs.nonEmpty) totalAggs
      else Seq(sum(col(cntCol)).cast("long").as("total"))
    val tot = counts.agg(aggs.head, aggs.tail: _*)
    val order = Seq(col(cntCol).desc, col(keyCol).asc)
    // k-row frame: the unpartitioned window below is bounded by the
    // TakeOrdered child (the plan-audit invariant in PlansSpec).
    val w = Window.orderBy(order: _*)
    counts.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cnt", sum(col(cntCol))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
  }
}
