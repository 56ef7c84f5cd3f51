package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("asof: latest prior right row per key; equal timestamps match; no-prior is null") {
    val left = Seq(
      (1L, 100L, 10L), // matches right at 90
      (1L, 50L, 11L),  // matches right at 50 (equality)
      (1L, 10L, 12L),  // no prior right -> null
      (2L, 100L, 13L)  // other key: matches 99
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 50L, 20L), (1L, 90L, 21L), (1L, 101L, 22L),
      (2L, 99L, 23L), (2L, 100L, 24L) // 100 ties with left t=100 -> matches (<=), larger id wins ties
    ).toDF("k", "t", "rid")
    val out = AsOfJoin.asof(left, right, "k", "t", "t", "lid", "rid")
      .select("lid", "matched_rid", "asof_lag")
      .as[(Long, Option[Long], Option[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((Some(21L), Some(10L))))
    assert(out(11L) == ((Some(20L), Some(0L))))
    assert(out(12L) == ((None, None)))
    assert(out(13L) == ((Some(24L), Some(0L))))
  }
}
