package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling main — not part of the library.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val manifest = graft.queries.Tables.manifest(spark, "/tmp/sfx10")
    val pipe = new graft.pipelines.VideoSlicing(
      () => new graft.ml.Models.FakeVideoTool, segDur = 300.0, minDur = 60.0)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val gated = pipe.gate(manifest.withColumn("probe_error", lit(null).cast("string")))
    val tiled = graft.operators.Tiling.tileSegments(
      gated.filter(col("status") === 1), "total_duration", 300.0, 60.0)
    time("tile only")(noop(tiled))
    time("tile + stem")(noop(tiled.withColumn("name",
      graft.functions.VideoFunctions.pathStem(col("file_path")))))
    time("tile + out_path")(noop(tiled.withColumn("out_path",
      graft.functions.VideoFunctions.genSavePath("/tmp/pipeline_out", col("file_path"),
        col("seg_idx"), col("start_time"), col("duration")))))
    time("segments full")(noop(pipe.segments(gated)))
    spark.stop()
  }
}
