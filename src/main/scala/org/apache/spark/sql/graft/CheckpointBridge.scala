package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `private[sql]` pieces of `Dataset.localCheckpoint`'s
  * implementation, so [[graft.ops.CheckpointOps]] can replicate the eager
  * local checkpoint exactly (same executedPlan RDD, same
  * `LogicalRDD.fromDataset(...).newInstance()` wrapper preserving output
  * partitioning/ordering) while fusing the materializing action with the
  * caller's convergence count. Same package-escalation technique as
  * [[ColumnBridge]]. */
object CheckpointBridge {

  /** The `executedPlan.execute().map(_.copy())` RDD `Dataset.checkpoint`
    * builds, already marked for local checkpointing (not yet materialized —
    * the caller's action does that). */
  def checkpointRdd(df: DataFrame): RDD[InternalRow] = {
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.execute().map(_.copy())
    rdd.localCheckpoint()
    rdd
  }

  /** Wrap the (materialized) checkpoint RDD exactly as
    * `Dataset.checkpoint` does. */
  def wrap(df: DataFrame, rdd: RDD[InternalRow]): DataFrame =
    ColumnBridge.ofRows(df.sparkSession,
      LogicalRDD.fromDataset(rdd,
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]],
        isStreaming = false).newInstance())
}
