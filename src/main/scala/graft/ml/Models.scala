package graft.ml

/** Pluggable model/tool interfaces with deterministic fakes — the same
  * constructor-injection seam the reference exposes (`mmdet_model=`
  * common/image/person_detect_op.py:26, `matcher=`
  * common/transform/similarity_op.py:8). Pipelines depend only on the
  * traits; production swaps in ONNX/JNI/ffmpeg implementations, tests and
  * the harness use the hash-seeded fakes (no GPUs/codecs in container).
  */
object Models {

  final case class Box(x1: Int, y1: Int, x2: Int, y2: Int)
  final case class Face(score: Double, area: Box)

  /** Person detection over a decoded frame (keyed by video/frame — fakes
    * never need pixels). Ref: common/image/person_detect_op.py:25-126. */
  trait PersonDetector extends Serializable {
    def detect(videoId: Long, frameIdx: Long): Seq[Box]
    /** Batched hook — real detectors override with one forward pass per
      * batch (GPU util); default delegates per item so fakes stay
      * bit-identical. */
    def detectBatch(items: Seq[(Long, Long)]): Seq[Seq[Box]] =
      items.map { case (v, f) => detect(v, f) }
  }

  /** Face detection within a person crop. Ref: common/image/face_detect_op.py:7-29. */
  trait FaceDetector extends Serializable {
    def detect(videoId: Long, frameIdx: Long, slot: Int): Seq[Face]
    def detectBatch(items: Seq[(Long, Long, Int)]): Seq[Seq[Face]] =
      items.map { case (v, f, s) => detect(v, f, s) }
  }

  /** Face quality scoring. Ref: common/image/face_quality_op.py:22-174. */
  trait FaceQualityScorer extends Serializable {
    def score(videoId: Long, frameIdx: Long, slot: Int): Double
    def scoreBatch(items: Seq[(Long, Long, Int)]): Seq[Double] =
      items.map { case (v, f, s) => score(v, f, s) }
  }

  /** Face embedding (AdaFace stand-in). Ref: common/transform/similarity_op.py:7-24. */
  trait FaceEmbedder extends Serializable {
    def embed(videoId: Long, frameIdx: Long, slot: Int): Array[Float]
    def embedBatch(items: Seq[(Long, Long, Int)]): Seq[Array[Float]] =
      items.map { case (v, f, s) => embed(v, f, s) }
  }

  /** VLM captioning. Ref: common/transform/generate_text_op.py:9-33. */
  trait Captioner extends Serializable {
    def caption(prompt: String, imagePaths: Seq[String]): String
    /** Batched inference hook — a real VLM overrides this to run ONE
      * forward pass per batch (GPU utilization: the reference feeds
      * batch-sized request lists, pipeline/caption.py:58-88). Default
      * delegates per row, so per-row fakes stay bit-identical. */
    def captionBatch(batch: Seq[(String, Seq[String])]): Seq[String] =
      batch.map { case (p, imgs) => caption(p, imgs) }
  }

  /** Image read boundary (cv2.imread stand-in): dimensions or None for a
    * missing/undecodable file. Ref: pipeline/for_high_bg_all_morelittler.py:146-152. */
  trait ImageReader extends Serializable {
    def dims(path: String): Option[(Int, Int)] // (h, w)
  }

  /** Grounding/SAM2 mask for a person box: the nonzero-mask bounding rect
    * on the full image (the reference takes cv2.boundingRect of the
    * predicted mask), or None when the mask comes back empty.
    * Ref: common/image/grounding_mask_op.py:15-41,
    * pipeline/for_high_bg_all_morelittler.py:199-207. */
  trait GroundingMasker extends Serializable {
    def maskRect(imageId: Long, box: Box, h: Long, w: Long): Option[Box]
    def maskRectBatch(items: Seq[(Long, Box, Long, Long)]): Seq[Option[Box]] =
      items.map { case (id, b, h, w) => maskRect(id, b, h, w) }
  }

  /** BEN2 background matting over a person crop; None mirrors the
    * reference's errors-to-None convention. Ref: common/transform/bg_rm_op.py:8-24. */
  trait Matting extends Serializable {
    def removeBackground(imageId: Long, boxIdx: Int): Option[Array[Byte]]
    def removeBackgroundBatch(items: Seq[(Long, Int)]): Seq[Option[Array[Byte]]] =
      items.map { case (id, i) => removeBackground(id, i) }
  }

  /** LBM relighting over a person crop; None on failure.
    * Ref: common/transform/lbm_op.py:14-32. */
  trait Relighter extends Serializable {
    def relight(imageId: Long, boxIdx: Int): Option[Array[Byte]]
    def relightBatch(items: Seq[(Long, Int)]): Seq[Option[Array[Byte]]] =
      items.map { case (id, i) => relight(id, i) }
  }

  /** ffprobe/ffmpeg boundary. Ref: common/video/video_probe_op.py:4-53,
    * common/video/ffmpeg_cut_op.py:10-112. */
  trait VideoTool extends Serializable {
    def probe(path: String): Either[String, (Double, Double)] // (duration, fps)
    def cut(src: String, dst: String, startSec: Double, durSec: Double,
            attempt: Int): Either[String, Unit]
  }

  /** Deterministic integer scramble shared by the fakes. */
  def scramble(x: Long): Long = {
    var h = x * -7046029254386353131L
    h ^= (h >>> 32)
    math.abs(h)
  }

  // ---- deterministic fakes -------------------------------------------

  final class FakePersonDetector extends PersonDetector {
    def detect(videoId: Long, frameIdx: Long): Seq[Box] = {
      val n = (scramble(videoId * 31 + frameIdx) % 4).toInt
      (0 until n).map { i =>
        val x1 = (scramble(videoId + frameIdx * 7 + i) % 600).toInt
        val y1 = (scramble(videoId + frameIdx * 11 + i) % 400).toInt
        Box(x1, y1, x1 + 120, y1 + 200)
      }
    }
  }

  final class FakeFaceDetector extends FaceDetector {
    def detect(videoId: Long, frameIdx: Long, slot: Int): Seq[Face] = {
      val h = scramble(videoId * 131 + frameIdx * 17 + slot)
      val n = (h % 3).toInt // 0, 1 or 2 faces in crop
      (0 until n).map { j =>
        val s = ((scramble(h + j) % 100) / 100.0)
        Face(s, Box(10 + j, 10, 60 + j, 80))
      }
    }
  }

  final class FakeFaceQualityScorer extends FaceQualityScorer {
    def score(videoId: Long, frameIdx: Long, slot: Int): Double =
      (scramble(videoId * 313 + frameIdx * 19 + slot) % 100) / 100.0
  }

  /** Embeddings lie on a 2-D arc inside R^8: identity picks the base axis
    * pair, frame index rotates the angle — so same-identity faces across
    * frames have cosine = cos(delta-angle), exercising the similarity
    * band-pass exactly like real drifting face embeddings. */
  final class FakeFaceEmbedder(nIdentities: Int = 5) extends FaceEmbedder {
    def embed(videoId: Long, frameIdx: Long, slot: Int): Array[Float] = {
      val identity = (scramble(videoId * 7 + slot) % nIdentities).toInt
      val theta = 0.18 * ((frameIdx / 50) % 6).toInt
      val v = new Array[Float](8)
      v(identity % 4) = math.cos(theta).toFloat
      v(4 + identity % 4) = math.sin(theta).toFloat
      v
    }
  }

  /** High 60 bits of md5(key) as a non-negative long — the SQL-replayable
    * recipe ([[graft.operators.Dedup.md5Hash60]]'s scalar twin):
    * `CAST(('0x' || substring(md5(key), 1, 15)) AS BIGINT)`. */
  def md5Long(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- md5-REPLAYABLE fakes (pipeline oracle companions) --------------
  //
  // The constrained-fake contract that makes E3's end-to-end output
  // SQL-replayable (the dedup_greedy_oracle constraint set, realized as
  // model fakes): identities are keyed by (video, slot) with DISJOINT
  // per-identity boxes (the greedy fold's IoU branch never fires),
  // phase-1 embeddings are exact one-hot axis pairs (cosine ∈ {0, 1} →
  // the fold has a closed form: per identity keep max quality, ties to
  // earliest seq; identity_idx = first-appearance order), and phase-2
  // embeddings are the (4, 3) rational rotation of the same axis pair
  // (cosine = 4/5 = 0.8 EXACTLY against the ref — inside the
  // [0.6, 0.85] band with no libm anywhere). All randomness is
  // md5-derived, so an external engine regenerates every decision.

  final class Md5PersonDetector extends PersonDetector {
    def detect(videoId: Long, frameIdx: Long): Seq[Box] = {
      val n = (md5Long(s"pd:$videoId:$frameIdx") % 3).toInt
      (0 until n).map { slot =>
        val id = (md5Long(s"id:$videoId:$slot") % 4).toInt
        Box(id * 200, 0, id * 200 + 120, 200)
      }
    }
  }

  final class Md5FaceDetector extends FaceDetector {
    def detect(videoId: Long, frameIdx: Long, slot: Int): Seq[Face] = {
      val nf = (md5Long(s"fd:$videoId:$frameIdx:$slot") % 3).toInt
      (0 until nf).map { j =>
        val s = (md5Long(s"fs:$videoId:$frameIdx:$slot:$j") % 100) / 100.0
        Face(s, Box(10 + j, 10, 60 + j, 80))
      }
    }
  }

  final class Md5FaceQualityScorer extends FaceQualityScorer {
    def score(videoId: Long, frameIdx: Long, slot: Int): Double =
      (md5Long(s"fq:$videoId:$frameIdx:$slot") % 100) / 100.0
  }

  /** `refMaxFrame` splits the phases: frames ≤ it embed as the one-hot
    * ref, later frames as the (4, 3) candidate rotation. */
  final class Md5FaceEmbedder(refMaxFrame: Long) extends FaceEmbedder {
    def embed(videoId: Long, frameIdx: Long, slot: Int): Array[Float] = {
      val id = (md5Long(s"id:$videoId:$slot") % 4).toInt
      val v = new Array[Float](8)
      if (frameIdx <= refMaxFrame) v(2 * id) = 1f
      else { v(2 * id) = 4f; v(2 * id + 1) = 3f }
      v
    }
  }

  /** Md5 twin of [[FakeGroundingMasker]] (same miss rate and dilation
    * shape, md5-derived so SQL replays it): ~1/16 None, else the box
    * dilated by (h%8, (h/8)%8) clipped to the image. */
  final class Md5GroundingMasker extends GroundingMasker {
    def maskRect(imageId: Long, box: Box, h: Long, w: Long): Option[Box] = {
      val hsh = md5Long(s"mr:$imageId:${box.x1}:${box.y1}")
      if (hsh % 16 == 0) None
      else {
        val dx = (hsh % 8).toInt
        val dy = ((hsh / 8) % 8).toInt
        val x1 = math.max(0, box.x1 - dx)
        val y1 = math.max(0, box.y1 - dy)
        val x2 = math.min(w.toInt, box.x2 + dx)
        val y2 = math.min(h.toInt, box.y2 + dy)
        if (x2 > x1 && y2 > y1) Some(Box(x1, y1, x2, y2)) else None
      }
    }
  }

  /** Caption = first 16 hex of md5(prompt + "|" + joined paths) — cheap,
    * deterministic, and replayable in SQL for the oracle. */
  final class FakeCaptioner extends Captioner {
    def caption(prompt: String, imagePaths: Seq[String]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = md.digest((prompt + "|" + imagePaths.mkString(",")).getBytes("UTF-8"))
      bytes.map("%02x".format(_)).mkString.substring(0, 16)
    }
  }

  /** Dims from the path hash; paths containing "missing" are unreadable
    * (cv2.imread → None in the reference). */
  final class FakeImageReader extends ImageReader {
    def dims(path: String): Option[(Int, Int)] =
      if (path == null || path.isEmpty || path.contains("missing")) None
      else {
        val h = scramble(path.hashCode.toLong)
        Some((400 + (h % 1600).toInt, 600 + ((h >>> 5) % 1600).toInt))
      }
  }

  /** Mask rect = person box dilated by a hash-derived margin then clipped
    * to the image; ~1/16 of masks come back empty (predictor miss). */
  final class FakeGroundingMasker extends GroundingMasker {
    def maskRect(imageId: Long, box: Box, h: Long, w: Long): Option[Box] = {
      val hsh = scramble(imageId * 1543L + box.x1 * 31L + box.y1)
      if (hsh % 16 == 0) None
      else {
        val dx = (hsh % 8).toInt
        val dy = ((hsh >>> 3) % 8).toInt
        val x1 = math.max(0, box.x1 - dx)
        val y1 = math.max(0, box.y1 - dy)
        val x2 = math.min(w.toInt, box.x2 + dx)
        val y2 = math.min(h.toInt, box.y2 + dy)
        if (x2 > x1 && y2 > y1) Some(Box(x1, y1, x2, y2)) else None
      }
    }
  }

  /** Deterministic matte payload; ~1/32 inference failures → None. */
  final class FakeMatting extends Matting {
    def removeBackground(imageId: Long, boxIdx: Int): Option[Array[Byte]] = {
      val h = scramble(imageId * 911L + boxIdx)
      if (h % 32 == 0) None else Some(s"matte:$imageId:$boxIdx".getBytes("UTF-8"))
    }
  }

  /** Deterministic relight payload; ~1/32 inference failures → None. */
  final class FakeRelighter extends Relighter {
    def relight(imageId: Long, boxIdx: Int): Option[Array[Byte]] = {
      val h = scramble(imageId * 977L + boxIdx)
      if (h % 32 == 0) None else Some(s"relight:$imageId:$boxIdx".getBytes("UTF-8"))
    }
  }

  /** Probe: duration/fps from the path hash; paths containing "corrupt"
    * fail. Cut: transient failure on attempt 0 for ~1/8 of outputs
    * (retries recover), permanent failure for paths containing "bad". */
  final class FakeVideoTool extends VideoTool {
    def probe(path: String): Either[String, (Double, Double)] =
      if (path.contains("corrupt")) Left("probe failed: moov atom not found")
      else {
        val h = scramble(path.hashCode.toLong)
        Right(((h % 2400).toDouble, 24.0 + (h % 3)))
      }
    def cut(src: String, dst: String, startSec: Double, durSec: Double,
            attempt: Int): Either[String, Unit] =
      if (src.contains("bad")) Left("cut failed: invalid stream")
      else if (scramble(dst.hashCode.toLong) % 8 == 0 && attempt == 0)
        Left("cut failed: transient io error")
      else Right(())
  }
}
