package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tiling

class TilingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference tiling loop transcribed for differential testing
    * (common/video/scene_segmenter_op.py:102-111 semantics). */
  private def refTile(total: Double, seg: Double, min: Double): Seq[(Long, Double, Double)] = {
    if (total <= 0) return Seq.empty
    var out = Vector.empty[(Long, Double, Double)]
    var idx = 0L
    var start = 0.0
    while (start < total) {
      val end = math.min(total, start + seg)
      if (end - start >= min) out :+= ((idx + 1, start, end))
      idx += 1
      start = idx * seg
    }
    out
  }

  test("tileSegments matches reference loop on boundary durations") {
    val durations = Seq(0.0, -5.0, 12.0, 59.999, 60.0, 299.9, 300.0, 300.1, 660.0, 899.99, 900.0, 3600.5)
    val df = durations.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("video_id", "total_duration")
    val got = Tiling.tileSegments(df, "total_duration", 300.0, 60.0)
      .select("video_id", "seg_idx", "start_time", "end_time")
      .as[(Long, Long, Double, Double)].collect().toSet
    val want = durations.zipWithIndex.flatMap { case (d, i) =>
      refTile(d, 300.0, 60.0).map { case (idx, s, e) => (i.toLong, idx, s, e) }
    }.toSet
    assert(got == want)
  }

  test("tileSegments property: segments disjoint, ordered, each >= min, within [0,total]") {
    val rng = new scala.util.Random(42)
    (1 to 200).map(_ => rng.nextDouble() * 5000.0).foreach { total =>
      val segs = refTile(total, 300.0, 60.0)
      segs.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(e1 <= s2 + 300.0)
        case _ =>
      }
      segs.foreach { case (_, s, e) =>
        assert(e - s >= 60.0 - 1e-9); assert(s >= 0.0); assert(e <= total + 1e-9)
      }
    }
  }

  /** Reference bisection transcribed (common/video/scene_segmenter_op.py:22-41). */
  private def refBisect(s: Long, e: Long, min: Long, max: Long): Seq[(Long, Long)] = {
    val dur = e - s
    if (dur >= min && dur <= max) Seq((s, e))
    else if (dur > max) {
      val mid = (s + e) / 2
      refBisect(s, mid, min, max) ++ refBisect(mid + 1, e, min, max)
    } else Seq.empty
  }

  test("bisectSpans matches reference recursion") {
    val spans = Seq((0L, 100000L), (0L, 9000L), (0L, 9001L), (5L, 1205L), (0L, 500L), (7L, 60000L))
    val df = spans.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "span_s", "span_e")
    val got = Tiling.bisectSpans(df, "span_s", "span_e", 1200L, 9000L, maxDepth = 10)
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    val want = spans.zipWithIndex.flatMap { case ((a, b), i) =>
      refBisect(a, b, 1200L, 9000L).map { case (x, y) => (i.toLong, x, y) }
    }.toSet
    assert(got == want)
  }

  test("samplers: every-k strides and last-n windows") {
    val df = Seq((1L, 0L), (2L, 1L), (3L, 120L)).toDF("id", "total")
    val everyK = Tiling.sampleEveryK(df, "total", 50L)
      .select("id", "frame_idx").as[(Long, Long)].collect().toSet
    assert(everyK == Set((2L, 0L), (3L, 0L), (3L, 50L), (3L, 100L)))
    val lastN = Tiling.sampleLastN(df, "total", 100L)
      .groupBy("id").agg(count(lit(1)).as("n"), min("frame_idx").as("lo"), max("frame_idx").as("hi"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(lastN == Set((2L, 1L, 0L, 0L), (3L, 100L, 20L, 119L)))
  }
}
