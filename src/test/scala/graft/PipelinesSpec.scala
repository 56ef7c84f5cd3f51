package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Models, Retry}
import graft.pipelines.{Captioning, FrameMining, VideoSlicing}

class PipelinesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("E1 slicing: probe errors dead-letter, short videos gate, cuts retried to success") {
    val manifest = Seq(
      (1L, "/data/good_long.mp4"),
      (2L, "/data/corrupt_file.mp4"),
      (3L, "/data/also_good.mp4")).toDF("video_id", "file_path")
    val p = new VideoSlicing(() => new Models.FakeVideoTool, segDur = 300.0, minDur = 60.0)
    val out = p.run(manifest).orderBy("video_id")
      .select("video_id", "status", "reason", "segments_count", "cuts_ok")
      .as[(Long, Int, String, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(2L)._2 == 0 && byId(2L)._3.contains("probe failed"))
    // good videos: every tiled segment cut ok (transient failures retried)
    Seq(1L, 3L).foreach { id =>
      val (_, status, _, segs, ok) = byId(id)
      if (status == 1) { assert(segs > 0); assert(ok == segs) }
    }
  }

  test("retry envelope: transient failure recovers, permanent failure reported") {
    var calls = 0
    val r = Retry.withRetry(3, 0L, 7L) { attempt =>
      calls += 1
      if (attempt < 1) Left("transient") else Right("ok")
    }
    assert(r == Right("ok") && calls == 2)
    val fail = Retry.withRetry(3, 0L, 7L)(_ => Left("always"))
    assert(fail == Left("always"))
  }

  test("E2 captioning: bare-path fallback, deterministic caption, record shape") {
    val input = Seq(
      (1L, "[\"/a.jpg\",\"/b.jpg\"]", "/out/1.png"),
      (2L, "/single.jpg", "/out/2.png")).toDF("doc_id", "input_images", "output_image")
    val pipe = new Captioning(() => new Models.FakeCaptioner)
    val out = pipe.run(input).orderBy("doc_id")
      .select("doc_id", "images", "caption", "record")
      .as[(Long, Seq[String], String, String)].collect()
    assert(out(0)._2 == Seq("/a.jpg", "/b.jpg"))
    assert(out(1)._2 == Seq("/single.jpg")) // bare path fallback
    val expectedPrompt = pipe.systemPrompt + "<image><image>" + pipe.question
    val md = java.security.MessageDigest.getInstance("MD5")
    val expCaption = md.digest((expectedPrompt + "|/a.jpg,/b.jpg").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 16)
    assert(out(0)._3 == expCaption)
    assert(out(0)._4.contains("\"task_type\":\"subject_driven\"") &&
      out(0)._4.contains(expCaption))
  }

  test("E3 frame mining: produces selected frames within band, deterministic") {
    val manifest = (0 until 6).map(i => (i.toLong, 6000L)).toDF("video_id", "total_frames")
    val pipe = new FrameMining(
      () => new Models.FakePersonDetector, () => new Models.FakeFaceDetector,
      () => new Models.FakeFaceQualityScorer, () => new Models.FakeFaceEmbedder())
    val out1 = pipe.run(manifest).collect()
    assert(out1.nonEmpty, "expected some mined GT frames")
    val rows = pipe.run(manifest)
      .select("video_id", "frame_idx", "avg_sim", "n_refs")
      .as[(Long, Long, Double, Long)].collect()
    rows.foreach { case (_, fidx, sim, nRefs) =>
      assert(sim >= 0.6 - 1e-9 && sim <= 0.85 + 1e-9) // band-pass held
      assert(nRefs >= 2 && nRefs <= 3)                // ref-count gate held
      assert(fidx >= 600)                             // only back-90% frames
    }
    val out2 = pipe.run(manifest).collect()
    assert(out1.map(_.toString).sorted.toSeq == out2.map(_.toString).sorted.toSeq)
  }

  test("E3 pair sink: ref crops + GT frames stored, pair records appended") {
    val manifest = (0 until 4).map(i => (i.toLong, 6000L)).toDF("video_id", "total_frames")
    val pipe = new FrameMining(
      () => new Models.FakePersonDetector, () => new Models.FakeFaceDetector,
      () => new Models.FakeFaceQualityScorer, () => new Models.FakeFaceEmbedder())
    val refs = pipe.mineRefs(manifest)
    val selected = pipe.mineCandidates(manifest, refs)
    val objRoot = java.nio.file.Files.createTempDirectory("graft_pairs").toString
    val jsonlRoot = java.nio.file.Files.createTempDirectory("graft_pairs_jsonl").toString
    val status = pipe.sinkPairs(selected, refs, new graft.sources.Sinks.LocalFsStore(objRoot), jsonlRoot)
      .as[(String, Boolean, String)].collect()
    assert(status.nonEmpty && status.forall(_._2), "all uploads should succeed")
    val recs = graft.sources.Sinks.readJsonl(spark, jsonlRoot,
      "task_type STRING, instruction STRING, input_images ARRAY<STRING>, output_image STRING")
    assert(recs.count() == selected.count())
    val r = recs.limit(1).as[(String, String, Seq[String], String)].head()
    assert(r._1 == "subject_driven" && r._3.nonEmpty && r._4.startsWith("gt/"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(objRoot, status.head._1)))
  }

  test("E4 bg curation: gates enforce resolution, person count, area ratio; masks written") {
    val root = java.nio.file.Files.createTempDirectory("graft_bg").toString
    val pipe = new graft.pipelines.BackgroundCuration(
      () => new Models.FakePersonDetector, new graft.sources.Sinks.LocalFsStore(root))
    // controlled records straight into the gates (bypassing detection)
    val recs = Seq(
      (1L, 1200L, 1800L, Seq((10, 10, 110, 210))),               // passes all gates
      (2L, 800L, 1800L, Seq((10, 10, 110, 210))),                // too short (h)
      (3L, 1200L, 1800L, Seq.empty[(Int, Int, Int, Int)]),       // zero persons
      (4L, 1200L, 1800L, (1 to 4).map(i => (i, i, i + 50, i + 80))), // too many persons
      (5L, 1000L, 1000L, Seq((0, 0, 1000, 1000))))               // area ratio 1.0 > 0.4
      .toDF("image_id", "h", "w", "boxes_raw")
      .withColumn("person_boxes", transform(col("boxes_raw"), t =>
        struct(t.getField("_1").as("x1"), t.getField("_2").as("y1"),
          t.getField("_3").as("x2"), t.getField("_4").as("y2"))))
    val kept = pipe.gates(recs).select("image_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val status = pipe.maskAndSink(pipe.gates(recs))
      .as[(String, Boolean, String)].collect()
    assert(status.length == 1 && status.head._2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, status.head._1)))
  }
}
