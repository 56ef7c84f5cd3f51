package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism floor for CPU-heavy stages.
  *
  * Spark parallelizes scans by file and row group; a table written as one
  * file with one row group (exactly what small exports and many ingest
  * jobs produce) yields a SINGLE input partition, so every narrow stage
  * rooted on it — explode fan-outs, per-row string assembly, model
  * `mapPartitions` — runs on one core no matter how many the cluster has.
  * `spark.sql.files.maxPartitionBytes` cannot help: a row group is the
  * atomic split unit.
  *
  * [[ensure]] repartitions ONLY when the plan's partition count is below
  * the floor: one cheap round-robin shuffle of the compact pre-fan-out
  * rows buys full-width execution of everything downstream. On healthy
  * inputs (thousands of partitions at 100 TB) it is a no-op, so pipeline
  * stages call it unconditionally at their entrance.
  */
object Parallelism {

  def ensure(df: DataFrame, minPartitions: Int = 0): DataFrame = {
    val min =
      if (minPartitions > 0) minPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < min) df.repartition(min) else df
  }
}
