package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native analog of the reference's `BaseOps.predict(item) -> item`
  * chaining contract (ref: common/base_ops.py:3-22): an op is a declarative
  * `DataFrame => DataFrame` stage. Because stages are plain Catalyst
  * transformations (not opaque lambdas over rows), the optimizer can push
  * filters / prune columns straight through a composed pipeline — the
  * reference's hand-tuned "cheap gates before model calls" ordering falls
  * out for free wherever stages stay declarative.
  */
trait PipeOp extends (DataFrame => DataFrame) { self =>
  def name: String
  /** Compose left-to-right, mirroring the reference's op-chain order. */
  def andThen(next: PipeOp): PipeOp = PipeOp(s"$name->${next.name}")(df => next(self(df)))
}

object PipeOp {
  def apply(opName: String)(f: DataFrame => DataFrame): PipeOp = new PipeOp {
    val name: String = opName
    def apply(df: DataFrame): DataFrame = f(df)
  }

  /** Hard filter gate: rows failing `pred` are dropped.
    * Ref pattern: pipeline/video_extract_frame.py:171-172 (inline gates). */
  def gate(opName: String, pred: Column): PipeOp =
    PipeOp(opName)(_.filter(pred))

  /** Dead-letter gate: rows failing `pred` are KEPT, tagged
    * `status = 0` + `reason`, matching the reference's convention of
    * recording rejects instead of dropping them
    * (ref: pipeline/cut_30min.py:38-43 — rejected rows flow to the summary
    * CSV with a reason). Downstream stages filter on `status === 1`. */
  def deadLetterGate(opName: String, pred: Column, reason: String): PipeOp =
    PipeOp(opName) { df =>
      val prevStatus = if (df.columns.contains("status")) col("status") else lit(1)
      val prevReason = if (df.columns.contains("reason")) col("reason") else lit(null).cast("string")
      df.withColumn("status", when(pred, prevStatus).otherwise(lit(0)))
        .withColumn("reason", when(pred, prevReason).otherwise(lit(reason)))
    }

  /** Error-as-column enrichment: run `value` but record failures in
    * `<outCol>_error` instead of failing the job — the reference's
    * errors-are-data convention (ref: common/video/video_probe_op.py:47-49,
    * common/video/ffmpeg_cut_op.py:92-94). For pure column expressions the
    * guard is a predicate; exceptions don't exist in codegen'd exprs. */
  def enrich(opName: String, outCol: String, value: Column,
             valid: Column, errorMsg: String): PipeOp =
    PipeOp(opName) { df =>
      df.withColumn(outCol, when(valid, value))
        .withColumn(s"${outCol}_error", when(valid, lit(null).cast("string")).otherwise(lit(errorMsg)))
    }
}

/** Ordered chain of ops; `run` folds the frame through every stage. */
final case class Pipeline(ops: PipeOp*) {
  def run(df: DataFrame): DataFrame = ops.foldLeft(df)((d, op) => op(d))
  def names: Seq[String] = ops.map(_.name)
}
