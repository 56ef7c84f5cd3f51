package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped/window aggregations from the reference's frame-mining pipeline.
  *
  * Scale notes: `top1PerBin` is a single window (one shuffle on the
  * partition keys, streaming rank — no sort-spill risk because each bin is
  * tiny); `frameScoreAgg` is a hash aggregate with map-side partial
  * aggregation. Both survive 100× scale-up as long as the partition key
  * cardinality grows with the data (video_id × bin does).
  */
object Agg {

  /** Top-1 row per bin by `score` (desc), deterministic via `tieBreak` asc —
    * the reference's temporal downsample: argmax combined_score per
    * 150-frame bin. Ref: pipeline/video_extract_frame.py:312-321. */
  def top1PerBin(df: DataFrame, partitionCols: Seq[String], score: Column,
                 tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(score.desc, tieBreak.asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Per-frame score aggregation: mean quality, mean similarity, combined
    * mean-of-means, all-persons-ok flag. Averages rounded to 6 dp for
    * cross-engine float determinism. Ref: pipeline/video_extract_frame.py:292-310. */
  def frameScoreAgg(df: DataFrame, groupCols: Seq[String], qCol: Column,
                    simCol: Column, okPred: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        round(avg(qCol), 6).as("avg_q"),
        round(avg(simCol), 6).as("avg_sim"),
        bool_and(okPred).as("all_ok"))
      .withColumn("combined", round((col("avg_q") + col("avg_sim")) / 2, 6))

  /** argmax: per group, the `pick` value on the row maximizing `ordering`
    * (ties → greatest `ordering` tuple wins; pass a struct ending in a
    * unique key for determinism). Ref: pipeline/video_extract_frame.py:296-304. */
  def argmaxBy(df: DataFrame, groupCols: Seq[String], pick: Column,
               ordering: Column, outName: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(max_by(pick, ordering).as(outName))
}
