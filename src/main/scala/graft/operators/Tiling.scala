package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generator-shaped operators (1 row → N rows) re-expressed relationally as
  * `explode(sequence(...))` so Catalyst treats them as a codegen'd Generate
  * node — no per-record driver loops, fully distributed, and the explode
  * multiplies partitions' rows in place (no shuffle).
  *
  * Scale note: each of these keeps the generated row count proportional to
  * its input row's own payload (segments per video, sampled frames per
  * video), so at 100 TB the fan-out is bounded per-task and needs no
  * repartition; downstream aggregations shuffle on the original key which
  * stays the partitioning key.
  *
  * Reference: HrLi97/dataPipeline_ops.
  */
object Tiling {

  private val emptyLongs = array().cast("array<bigint>")

  /** Guarded inclusive sequence: empty array when the range is empty.
    * (Spark's `sequence(a,b)` auto-negates the step when b < a, which would
    * resurrect rows for zero-segment inputs — guard explicitly.) */
  private def seqOrEmpty(start: Column, stop: Column, step: Long = 1L): Column =
    when(stop >= start, sequence(start, stop, lit(step))).otherwise(emptyLongs)

  /** Fixed-duration tiling: walk `[0, totalDur)` in `segDur` strides, keep
    * slices >= `minDur`; emits 1-based `seg_idx`, `start_time`, `end_time`,
    * `duration`. Rows with non-positive duration emit no segments.
    * Ref: common/video/scene_segmenter_op.py:80-174 (tiling loop 102-111)
    * and pipeline/cut_ruidi.py:50-77 (provably same output for total > 0). */
  def tileSegments(df: DataFrame, durCol: String, segDur: Double, minDur: Double): DataFrame = {
    val dur = col(durCol)
    val n = when(dur > 0, ceil(dur / segDur)).otherwise(lit(0L))
    df.withColumn("seg0", explode(seqOrEmpty(lit(0L), n - 1)))
      .withColumn("seg_idx", col("seg0") + 1)
      .withColumn("start_time", col("seg0") * segDur)
      .withColumn("end_time", least(dur, col("start_time") + segDur))
      .withColumn("duration", col("end_time") - col("start_time"))
      .filter(col("duration") >= minDur)
      .drop("seg0")
  }

  /** Every-`step`-th frame index in `[0, totalFrames)`.
    * Ref: common/video/decord_reader_op.py:43-48 (sample_frames_every_k_sec). */
  def sampleEveryK(df: DataFrame, totalFramesCol: String, step: Long,
                   outCol: String = "frame_idx"): DataFrame = {
    val total = col(totalFramesCol)
    df.withColumn(outCol, explode(seqOrEmpty(lit(0L), total - 1, step)))
  }

  /** Last `n` frame indices `[max(0, total-n), total)`.
    * Ref: common/video/decord_reader_op.py:51-57 (sample_last_n_sec_frames). */
  def sampleLastN(df: DataFrame, totalFramesCol: String, n: Long,
                  outCol: String = "frame_idx"): DataFrame = {
    val total = col(totalFramesCol)
    df.withColumn(outCol, explode(seqOrEmpty(greatest(lit(0L), total - n), total - 1)))
  }

  /** Recursive midpoint bisection of frame spans until every span's length
    * lands in `[minF, maxF]`; spans that bisect below `minF` are dropped.
    * Matches the reference exactly: keep when `min <= len <= max`; when
    * `len > max` split into `(s, mid)` and `(mid+1, e)` with
    * `mid = (s+e) // 2`; otherwise (len < min) drop.
    * Ref: common/video/scene_segmenter_op.py:22-41 (split_scene_recursively).
    *
    * Implemented as a bounded iterative self-explosion (depth `maxDepth`
    * halves span length each round → 2^maxDepth reduction), entirely in
    * Catalyst — no driver-side recursion over data. */
  def bisectSpans(df: DataFrame, startCol: String, endCol: String,
                  minF: Long, maxF: Long, maxDepth: Int = 24): DataFrame = {
    val withSpan = df.withColumn("_s", col(startCol).cast("long"))
                     .withColumn("_e", col(endCol).cast("long"))
    val expanded = (1 to maxDepth).foldLeft(withSpan) { (cur, _) =>
      val len = col("_e") - col("_s")
      val mid = floor((col("_s") + col("_e")) / lit(2.0)).cast("long")
      val halves = when(len > maxF,
          array(struct(col("_s").as("s"), mid.as("e")),
                struct((mid + 1).as("s"), col("_e").as("e"))))
        .otherwise(array(struct(col("_s").as("s"), col("_e").as("e"))))
      cur.withColumn("_h", explode(halves))
         .withColumn("_s", col("_h.s")).withColumn("_e", col("_h.e"))
         .drop("_h")
    }
    expanded
      .filter(col("_e") - col("_s") >= minF && col("_e") - col("_s") <= maxF)
      .withColumn("span_start", col("_s"))
      .withColumn("span_end", col("_e"))
      .withColumn("span_len", col("_e") - col("_s"))
      .drop("_s", "_e")
  }
}
