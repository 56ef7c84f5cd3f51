package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Storage

class StorageSpec extends AnyFunSuite {
  import TestSpark.spark

  test("partitioned write: reads prune partitions at the directory level") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Storage.writePartitioned(docs, dir, "lang")
    val read = spark.read.parquet(dir).filter(col("lang") === "de")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in:\n$plan")
    assert(read.count() == docs.filter(col("lang") === "de").count())
  }

  test("compaction: many small files become few range-clustered files") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_small").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/out"
    // 40 tiny files, keys shuffled across them (worst-case clustering)
    (0L until 4000L).map(i => (i * 2654435761L % 4000L, s"payload_$i"))
      .toDF("k", "v").repartition(40).write.mode("overwrite").parquet(inDir)
    val (before, after) = Storage.compact(spark, inDir, outDir, targetFileMB = 1, "k")
    assert(before == 40L && after < before)
    // same rows survive
    assert(spark.read.parquet(outDir).count() == 4000L)
    // clustering: per-file key ranges are disjoint (footer-stat skipping)
    val ranges = spark.read.parquet(outDir)
      .select(col("k"), input_file_name().as("f"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"overlapping file ranges $a $b")
      case _ => ()
    }
  }

  test("zOrderKey: matches scalar Morton interleave; locality beats 1-D sort") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Storage.zOrderKey(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(x, y), s"($x,$y)") }
    // locality: within any 64-key z-range, the x/y bounding box is small
    // (a 1-D sort by x would put all 32 y-values in every x-slice)
    val byZ = got.sortBy(_._3).grouped(64).toSeq
    val avgBox = byZ.map { g =>
      (g.map(_._1).max - g.map(_._1).min + 1) * (g.map(_._2).max - g.map(_._2).min + 1)
    }.sum.toDouble / byZ.size
    assert(avgBox <= 256.0, s"z-order locality too weak: avg bounding box $avgBox")
  }

  test("bucketed tables: co-located join runs without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      Storage.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_bucketed", "l_orderkey", 8)
      Storage.writeBucketed(o.select("o_orderkey", "o_totalprice"), "o_bucketed", "o_orderkey", 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
