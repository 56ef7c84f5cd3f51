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
