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
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
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
      "di_full" -> (() => graft.queries.TextQueries.incrementalVerdicts(
        graft.ops.Parallelism.ensure(table(spark, dir, "documents"))).orderBy("doc_id")),
      "di_nosort" -> (() => graft.queries.TextQueries.incrementalVerdicts(
        graft.ops.Parallelism.ensure(table(spark, dir, "documents")))),
      "q1_plain" -> (() => {
        import org.apache.spark.sql.types.DecimalType
        table(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_base_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),
      "q1_ensure" -> (() => {
        import org.apache.spark.sql.types.DecimalType
        graft.ops.Parallelism.ensure(table(spark, dir, "lineitem")
            .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_base_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),
      "ad_approx_hash" -> (() => graft.ops.Parallelism.byHash(
          table(spark, dir, "events").select(col("event_type"), col("user_id")),
          col("user_id"))
        .groupBy("event_type").agg(approx_count_distinct(col("user_id"), 0.015).as("a"))),
      "ad_approx_plain" -> (() => table(spark, dir, "events")
        .groupBy("event_type").agg(approx_count_distinct(col("user_id"), 0.015).as("a"))),
      "ad_approx_rsd05" -> (() => table(spark, dir, "events")
        .groupBy("event_type").agg(approx_count_distinct(col("user_id"), 0.05).as("a"))),
      "ad_exact_hash" -> (() => graft.ops.Parallelism.byHash(
          table(spark, dir, "events").select(col("event_type"), col("user_id")),
          col("user_id"))
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("e"))),
      "scan_only" -> (() => table(spark, dir, "events").select(col("event_id"))),
      "scan_sort" -> (() => table(spark, dir, "events").select(col("event_id"))
        .orderBy("event_id"))
    )

    // JOBS mode: build (and once noop-exec) a REGISTERED query while a
    // listener tallies job count / task count / job wall — attributes a
    // checkpoint-chain's plan seconds to scheduling vs compute.
    if (sys.env.contains("SPARK_GRAFT_JOBS")) {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val jobNanos = new java.util.concurrent.atomic.AtomicLong
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.remove(j.jobId)).foreach(t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0))
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); ()
        }
      })
      for (name <- args.tail) {
        jobs.set(0); tasks.set(0); jobNanos.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        val bJobs = jobs.get; val bTasks = tasks.get; val bNanos = jobNanos.get
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        println(f"$name%-28s plan=${(t1 - t0) / 1e9}%6.2fs (jobs=$bJobs tasks=$bTasks jobWall=${bNanos / 1e9}%6.2fs) " +
          f"exec=${(t2 - t1) / 1e9}%6.2fs (jobs=${jobs.get - bJobs} tasks=${tasks.get - bTasks})")
      }
      spark.stop(); return
    }
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
