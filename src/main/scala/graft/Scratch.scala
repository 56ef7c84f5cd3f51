package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for optimization-round hypothesis
  * isolation. Times named DataFrame variants with the noop sink.
  * Usage: runMain graft.Scratch [sfDir] [variant ...]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    import graft.queries.Tables.table

    def boxesDf(s: SparkSession): DataFrame = {
      val e = table(s, dir, "events").select(col("event_id"),
        (col("event_id") % 4).as("n_boxes"),
        (lit(400L) + col("event_id") % 600).as("h"),
        (lit(640L) + col("event_id") % 1280).as("w"))
      val idxs = when(col("n_boxes") >= 1, sequence(lit(1L), col("n_boxes")))
        .otherwise(array().cast("array<bigint>"))
      e.withColumn("boxes", transform(idxs, i => struct(
        ((col("event_id") * 7 + i * 13) % 600).as("x1"),
        ((col("event_id") * 11 + i * 17) % 400).as("y1"),
        ((col("event_id") * 7 + i * 13) % 600 + 50 + (col("event_id") + i) % 200).as("x2"),
        ((col("event_id") * 11 + i * 17) % 400 + 80 + (col("event_id") * 3 + i) % 240).as("y2"))))
    }
    import graft.functions.VideoFunctions.clippedArea
    def maxArea: Column = array_max(transform(col("boxes"), b =>
      clippedArea(b.getField("x1"), b.getField("y1"), b.getField("x2"), b.getField("y2"),
        col("w"), col("h"))))

    val variants: Map[String, () => DataFrame] = Map(
      "gar_current" -> (() => boxesDf(spark)
        .filter(size(col("boxes")) >= 1)
        .withColumn("max_area", maxArea)
        .withColumn("area_ratio", col("max_area") / (col("h") * col("w")).cast("double"))
        .filter(col("area_ratio") <= 0.4)
        .select("event_id", "h", "w", "max_area", "area_ratio")
        .orderBy("event_id")),
      "gar_nosort" -> (() => boxesDf(spark)
        .filter(size(col("boxes")) >= 1)
        .withColumn("max_area", maxArea)
        .withColumn("area_ratio", col("max_area") / (col("h") * col("w")).cast("double"))
        .filter(col("area_ratio") <= 0.4)
        .select("event_id", "h", "w", "max_area", "area_ratio")),
      "gar_sortearly" -> (() => {
        val sorted = table(spark, dir, "events").select(col("event_id"))
          .repartitionByRange(col("event_id"))
        val e = sorted.select(col("event_id"),
          (col("event_id") % 4).as("n_boxes"),
          (lit(400L) + col("event_id") % 600).as("h"),
          (lit(640L) + col("event_id") % 1280).as("w"))
        val idxs = when(col("n_boxes") >= 1, sequence(lit(1L), col("n_boxes")))
          .otherwise(array().cast("array<bigint>"))
        e.withColumn("boxes", transform(idxs, i => struct(
            ((col("event_id") * 7 + i * 13) % 600).as("x1"),
            ((col("event_id") * 11 + i * 17) % 400).as("y1"),
            ((col("event_id") * 7 + i * 13) % 600 + 50 + (col("event_id") + i) % 200).as("x2"),
            ((col("event_id") * 11 + i * 17) % 400 + 80 + (col("event_id") * 3 + i) % 240).as("y2"))))
          .filter(size(col("boxes")) >= 1)
          .withColumn("max_area", maxArea)
          .withColumn("area_ratio", col("max_area") / (col("h") * col("w")).cast("double"))
          .filter(col("area_ratio") <= 0.4)
          .select("event_id", "h", "w", "max_area", "area_ratio")
          .sortWithinPartitions("event_id")
      }),
      "gar_once" -> (() => {
        import graft.plans.Once.once
        val sorted = table(spark, dir, "events").select(col("event_id"))
          .orderBy("event_id")
        val e = sorted.select(col("event_id"),
          (col("event_id") % 4).as("n_boxes"),
          (lit(400L) + col("event_id") % 600).as("h"),
          (lit(640L) + col("event_id") % 1280).as("w"))
          .filter(col("n_boxes") >= 1)
        val idxs = sequence(lit(1L), col("n_boxes"))
        e.withColumn("boxes", once(transform(idxs, i => struct(
            ((col("event_id") * 7 + i * 13) % 600).as("x1"),
            ((col("event_id") * 11 + i * 17) % 400).as("y1"),
            ((col("event_id") * 7 + i * 13) % 600 + 50 + (col("event_id") + i) % 200).as("x2"),
            ((col("event_id") * 11 + i * 17) % 400 + 80 + (col("event_id") * 3 + i) % 240).as("y2")))))
          .withColumn("max_area", once(maxArea))
          .withColumn("area_ratio", col("max_area") / (col("h") * col("w")).cast("double"))
          .filter(col("area_ratio") <= 0.4)
          .select("event_id", "h", "w", "max_area", "area_ratio")
      }),
      "scan_only" -> (() => table(spark, dir, "events").select(col("event_id"))),
      "scan_sort" -> (() => table(spark, dir, "events").select(col("event_id"))
        .orderBy("event_id"))
    )

    val names = if (args.length > 1) args.tail.toSeq else variants.keys.toSeq.sorted
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      for (name <- names) {
        println(s"==== $name ====")
        println(variants(name)().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      spark.stop(); return
    }
    for (name <- names; fn = variants(name)) {
      // warm
      fn().write.mode("overwrite").format("noop").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-16s min=${times.min}%6.3f  runs=${times.map(t => f"$t%5.3f").mkString(",")}")
    }
    spark.stop()
  }
}
