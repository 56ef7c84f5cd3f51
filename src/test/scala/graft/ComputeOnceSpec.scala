package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Once.once

/** The r15 evaluation barrier ([[graft.plans.ComputeOnce]]) and the
  * sort-early rewrite shape it enables: value transparency, the
  * no-duplication / no-pushdown plan contract, and row-for-row
  * equivalence of `repartitionByRange + derive + sortWithinPartitions`
  * with the plain `derive + orderBy` form it replaces. */
class ComputeOnceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("once() is value-transparent (including nulls)") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("x")
    val plainRows = df.select((col("x") * 2).as("y")).collect().toSeq
    val onceRows = df.select(once(col("x") * 2).as("y")).collect().toSeq
    assert(onceRows == plainRows)
  }

  test("a filter on a once()-projected column is not pushed below the projection") {
    val df = spark.range(100).toDF("id")
      .withColumn("heavy", once(col("id") % 7))
      .filter(col("heavy") === 0)
    val p = df.queryExecution.executedPlan.toString
    // without the barrier the predicate is rewritten to (id % 7) = 0 and
    // pushed into the scan; with it, the filter references the attribute
    assert(p.contains("compute_once"),
      s"expected compute_once in plan:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(id)"), "no scan here — guard only")
    val filterLine = p.linesIterator.find(_.contains("Filter")).getOrElse("")
    assert(!filterLine.contains("% 7"),
      s"filter re-derived the heavy expression instead of referencing it: $filterLine")
  }

  test("once() evaluates the wrapped expression exactly once per row") {
    // CollapseProject would inline a deterministic alias into both
    // consumers; the barrier must keep one shared evaluation. Count real
    // evaluations through a Spark accumulator-free proxy: a value that
    // differs per evaluation would break equality between two consumers.
    val df = spark.range(50).toDF("id")
      .withColumn("h", once(col("id") * 3))
      .select((col("h") + 1).as("a"), (col("h") + 2).as("b"))
    // plan must carry a single compute_once site
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.sliding("compute_once".length).count(_ == "compute_once") == 1,
      s"expected exactly one compute_once site in:\n$p")
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 1))
  }

  test("sort-early shape (byRange + derive + sortWithinPartitions) equals derive + orderBy") {
    val base = spark.range(0, 1000).toDF("k")
      .select((col("k") * 37 % 1000).as("k")) // shuffled key order
    def derive(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", col("k") % 5)
      .filter(col("v") =!= 3)
      .withColumn("s", concat(lit("p"), col("k")))
    val plain = derive(base).orderBy("k").collect().toSeq
    val early = derive(graft.ops.Parallelism.byRange(base, col("k")))
      .sortWithinPartitions("k").collect().toSeq
    assert(early == plain)
  }

  test("byRange pins the shuffle-partition count (AQE cannot coalesce the compute stage)") {
    val df = graft.ops.Parallelism.byRange(spark.range(1000).toDF("k"), col("k"))
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(df.rdd.getNumPartitions == n,
      s"expected the pinned $n partitions, got ${df.rdd.getNumPartitions}")
  }
}
