package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VideoFunctions._

class VideoFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("path basename/stem handle extensions, dots, and extension-less names") {
    val df = Seq(
      "/a/b/video.mp4", "/a/b/video.tar.gz", "/noslash.mp4", "/a/b/noext", "/a/b/.hidden"
    ).toDF("p").select(pathBasename($"p").as("b"), pathStem($"p").as("s"))
    assert(df.as[(String, String)].collect().toSeq == Seq(
      ("video.mp4", "video"), ("video.tar.gz", "video.tar"),
      ("noslash.mp4", "noslash"), ("noext", "noext"), (".hidden", "")))
  }

  test("fmtTimeLabel matches HH-MM-SS") {
    val df = Seq(0.0, 59.9, 60.0, 3599.999, 3600.0, 86399.5).toDF("s")
      .select(fmtTimeLabel($"s").as("l"))
    assert(df.as[String].collect().toSeq ==
      Seq("00-00-00", "00-00-59", "00-01-00", "00-59-59", "01-00-00", "23-59-59"))
  }

  test("parseRational: rationals, zero denominator") {
    val df = Seq("30000/1001", "25/1", "0/0", "24/0").toDF("r")
      .select(parseRational($"r").as("fps"))
    val got = df.as[Double].collect().toSeq
    assert(math.abs(got(0) - 29.97002997002997) < 1e-12)
    assert(got(1) == 25.0 && got(2) == 0.0 && got(3) == 0.0)
  }

  test("deriveDuration and resolveDuration guards") {
    val df = Seq((240L, 24.0), (100L, 0.0)).toDF("frames", "fps")
      .select(deriveDuration($"frames", $"fps").as("d"))
    assert(df.as[Double].collect().toSeq == Seq(10.0, 0.0))
    val r = Seq((Some(5.0), 1.0, 9.0), (None, 1.0, 9.0)).toDF("dur", "st", "en")
      .select(resolveDuration($"dur", $"st", $"en").as("d"))
    assert(r.as[Double].collect().toSeq == Seq(5.0, 8.0))
  }

  test("iou column expr matches scalar impl") {
    val cases = Seq(
      (0.0, 0.0, 10.0, 10.0, 5.0, 0.0, 15.0, 10.0),
      (0.0, 0.0, 10.0, 10.0, 0.0, 0.0, 10.0, 10.0),
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val df = cases.toDF("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4")
      .select(iou($"a1", $"a2", $"a3", $"a4", $"b1", $"b2", $"b3", $"b4").as("v"))
    val want = cases.map(c => graft.operators.GreedyDedup.iouScalar(c._1, c._2, c._3, c._4, c._5, c._6, c._7, c._8))
    assert(df.as[Double].collect().toSeq == want)
  }

  test("normalizeBoxes floors fractional coords to longs") {
    val df = Seq(Tuple1(Seq(Seq(1.9, 2.1, 10.7, 20.999)))).toDF("boxes")
      .select(normalizeBoxes($"boxes").as("nb"))
    assert(df.as[Seq[Seq[Long]]].collect().head == Seq(Seq(1L, 2L, 10L, 20L)))
  }

  test("shot_boundaries: each detected shot is exactly one planted scene, in order") {
    // Closed-form law of the md5 synthesis: scenes are fidx div shot_len
    // and every scene index occurs among the sampled frames (sample step
    // 10 < min shot_len 40), so the k-th detected shot of a video must
    // cover scene k and nothing else — boundaries land exactly at scene
    // changes, no split or merged shots anywhere.
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val rows = graft.queries.CoreQueries.shotBoundariesQ
      .spark(TestSpark.spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (vid, shotId, start, end) =>
      val len = h60(s"sb:len:$vid") % 80 + 40
      assert(start / len == shotId, s"video $vid shot $shotId starts in scene ${start / len}")
      assert(end / len == shotId, s"video $vid shot $shotId ends in scene ${end / len}")
    }
    // shots are contiguous per video: shot k+1 starts one sample step
    // after shot k ends
    rows.groupBy(_._1).values.foreach { vs =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, _, e1), (_, _, s2, _)) => assert(s2 == e1 + 10)
        case _ =>
      }
    }
  }
}
