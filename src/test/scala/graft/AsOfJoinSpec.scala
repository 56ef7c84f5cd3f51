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

  test("scd2_history: intervals partition each user's timeline, states alternate, one current row") {
    val rows = graft.queries.MiscQueries.scd2History
      .spark(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, hist) =>
      val ordered = hist.sortBy(h => (h._4, h._2))
      // exactly one open (current) interval per user, and it is the last
      assert(ordered.count(_._5.isEmpty) == 1 && ordered.last._5.isEmpty)
      ordered.foreach(h => assert((h._6 == 1) == h._5.isEmpty))
      // contiguous: each interval closes 1ns before the next opens
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4 - 1), s"user $user gap/overlap at ${b._4}")
          assert(a._3 != b._3, s"user $user adjacent intervals share state")
        case _ =>
      }
    }
  }

  test("outlier_iqr: fences and flag counts match a driver-side quartile recompute") {
    val rows = graft.queries.MiscQueries.outlierIqr
      .spark(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val raw = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.foreach { r =>
      val vs = raw.filter(_._1 == r.getString(0)).map(_._2).sorted
      def quantile(p: Double): Double = {
        val pos = p * (vs.length - 1)
        val lo = pos.toInt; val frac = pos - lo
        if (frac == 0) vs(lo) else vs(lo) + frac * (vs(lo + 1) - vs(lo))
      }
      val (q1, q3) = (quantile(0.25), quantile(0.75))
      val (lo, hi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      assert(r.getLong(1) == vs.length)
      assert(r.getLong(2) == vs.count(v => v < lo || v > hi).toLong)
      assert(math.abs(r.getDouble(3) - lo) < 1e-5 && math.abs(r.getDouble(4) - hi) < 1e-5)
      assert(r.getLong(2) > 0 && r.getLong(2) < r.getLong(1)) // both classes fire
    }
  }

  test("blocklist_filter: keep verdict is exactly the absence of blocked tokens") {
    val rows = graft.queries.MiscQueries.blocklistFilter
      .spark(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val raw = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    rows.foreach { r =>
      val n = raw(r.getLong(0)).count(t => t == "dup" || t == "unsafe")
      assert(r.getLong(1) == n)
      assert(r.getInt(2) == (if (n == 0) 1 else 0))
    }
    // both verdict classes fire
    assert(rows.exists(_.getInt(2) == 0) && rows.exists(_.getInt(2) == 1))
  }

  test("intervalOverlap equals the naive quadratic join; each pair emitted exactly once") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    // deterministic mixed intervals: varied lengths, shared bins, exact-touch
    // boundaries, degenerate (hi < lo) rows that must be dropped
    val mk = (ids: Range, off: Int) => ids.map { i =>
      val lo = (i * 37 + off) % 500
      (i.toLong, lo.toDouble, (lo + (if (i % 11 == 0) -5 else i % 40)).toDouble)
    }
    val left = mk(0 until 80, 0).toDF("ida", "lo", "hi")
    val right = mk(100 until 180, 13).toDF("idb", "lo", "hi")
    val got = graft.operators.RangeJoin.intervalOverlap(left, right, binWidth = 16.0)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    // exactly-once: no duplicate pair rows from multi-bin co-coverage
    assert(got.distinct.length == got.length, "claim-ownership dedup violated")
    val l = left.as[(Long, Double, Double)].collect().filter(t => t._2 <= t._3)
    val r = right.as[(Long, Double, Double)].collect().filter(t => t._2 <= t._3)
    val naive = for {
      (ia, la, ha) <- l; (ib, lb, hb) <- r if la <= hb && lb <= ha
    } yield (ia, ib)
    assert(got.toSet == naive.toSet, "overlap pair set diverges from the naive join")
    assert(naive.nonEmpty)
  }
}
