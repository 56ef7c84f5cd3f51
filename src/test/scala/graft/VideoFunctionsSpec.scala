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
}
