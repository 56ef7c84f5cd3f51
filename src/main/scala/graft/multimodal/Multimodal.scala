package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The decode step is a clearly-marked STUB (this container has no codec
  * libraries): it derives metadata deterministically from the raw bytes so
  * the Spark-side plumbing — schema, partition-function signature, batch
  * shape, downstream relational sampling — is real and testable, and the
  * DuckDB oracle can replay it. A production deployment swaps
  * [[StubCodec]] for a JNI/FFI codec behind the same trait.
  *
  * Scale: bytes live in a `binary` column that is column-pruned away by
  * every stage that doesn't touch it (never carried "just in case" — the
  * opposite of the reference's everything-on-the-item dicts, SURVEY §4).
  */
object Multimodal {

  case class MediaItem(media_id: Long, kind: String, path: String, bytes: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Long, height: Long, n_frames: Long, checksum: Long)

  /** Pluggable decoder boundary — per-executor, batch-oriented. */
  trait MediaCodec extends Serializable {
    def decode(item: MediaItem): MediaMeta
  }

  /** STUB codec: deterministic metadata from byte content only.
    * width/height/frames are synthetic functions of size; checksum is the
    * byte-value sum (replayable by any engine). A real codec would parse
    * container headers here (ref decodes via decord/cv2:
    * common/video/decord_reader_op.py:13-41, common/video/video_info_op.py:6-33). */
  object StubCodec extends MediaCodec {
    def decode(item: MediaItem): MediaMeta = {
      val n = item.bytes.length.toLong
      var sum = 0L
      var i = 0
      while (i < item.bytes.length) { sum += item.bytes(i) & 0xffL; i += 1 }
      val frames = if (item.kind == "video") 1L + n % 240L else 1L
      MediaMeta(item.media_id, item.kind, n, 64L + n % 512L, 64L + (n * 3) % 512L, frames, sum)
    }
  }

  /** Pixel-real image codec on pure-JVM `javax.imageio` (PNG/JPEG/BMP/GIF
    * — the formats the JDK ships readers for): real width/height from the
    * decoded raster; bytes that are not a decodable image (or non-image
    * kinds) fall back to [[StubCodec]]'s deterministic metadata, so mixed
    * corpora keep flowing — the errors-as-data convention, not an
    * exception. Ref decode position: common/video/video_info_op.py:6-33. */
  object ImageIoCodec extends MediaCodec {

    /** Magic-byte sniff for the formats the JDK decodes (PNG/JPEG/GIF/BMP).
      * Attempting `ImageIO.read` on arbitrary bytes costs a reader search
      * plus an exception per row — ~100µs each, which dominates a mixed
      * corpus scan; the sniff rejects non-images in a few byte compares. */
    def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M'))

    def decode(item: MediaItem): MediaMeta = {
      val real =
        if (item.kind != "image" || !looksLikeImage(item.bytes)) None
        else
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(item.bytes)))
          catch { case _: Exception => None }
      real match {
        case Some(img) =>
          val stub = StubCodec.decode(item) // byte-sum checksum stays shared
          stub.copy(width = img.getWidth.toLong, height = img.getHeight.toLong, n_frames = 1L)
        case None => StubCodec.decode(item)
      }
    }

    /** Pixel half of the resize stage: aspect-preserving scale to
      * `maxSide`, re-encoded as PNG; None when the bytes don't decode.
      * (The relational half — target-dimension math — is [[resizePlan]];
      * this must agree with it.) */
    def resize(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val longest = math.max(w, h)
          if (longest <= maxSide) bytes
          else {
            val (ow, oh) = (w.toLong * maxSide / longest, h.toLong * maxSide / longest)
            val out = new java.awt.image.BufferedImage(
              ow.toInt, oh.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow.toInt, oh.toInt, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            bos.toByteArray
          }
        }
      } catch { case _: Exception => None }
  }

  /** 64-bit difference hash (dHash) of decodable image bytes: decode →
    * 9×8 grayscale downsample → bit (row-major) set when pixel(x,y) <
    * pixel(x+1,y). Near-identical images (recompression, small edits,
    * resizes) land within a few Hamming bits. None when the bytes don't
    * decode. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    if (!ImageIoCodec.looksLikeImage(bytes)) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val small = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 9, 8, null)
        } finally g.dispose()
        var h = 0L
        var bit = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            def gray(px: Int): Int = {
              val rgb = small.getRGB(px, y)
              (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            }
            if (gray(x) < gray(x + 1)) h |= (1L << bit)
            bit += 1
            x += 1
          }
          y += 1
        }
        h
      }
    } catch { case _: Exception => None }

  /** Deterministic content hash for bytes that are NOT a decodable image
    * (FNV + splitmix64 finisher — same mix family as the text SimHash
    * token hash), so a mixed corpus still gets exact-duplicate blocking. */
  def byteContentHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Deterministic synthetic noise PNG (for planted near-duplicate
    * evidence): 36×32 grayscale noise from a splitmix64 stream seeded by
    * `seed`. Distinct seeds give dHashes ~32 Hamming bits apart (each of
    * the 64 comparison bits is an independent coin flip across images),
    * while the `perturbed` twin differs in ONE source pixel by a small
    * delta — that pixel feeds at most the two adjacent 9×8 cell
    * comparisons, so the twin's dHash sits within ≤2 Hamming bits of the
    * original. Pure in-JVM rendering + `javax.imageio` PNG encode, so the
    * bytes are reproducible across runs. */
  def syntheticPng(seed: Long, perturbed: Boolean = false): Array[Byte] = {
    val (w, h) = (36, 32)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (next() & 0xffL).toInt
        val v = if (perturbed && x == 7 && y == 5) math.min(255, g + 6) else g
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 9×8 grayscale PNG whose pixel (x, y) is the FIRST BYTE of
    * md5("graft-dimg:seed:x:y") — the same value an external engine reads
    * from the hex digest, so the downstream dHash is SQL-replayable: at
    * the dHash's own 9×8 geometry the decode → drawImage downsample is
    * the identity map, and the luma formula (v·299 + v·587 + v·114)/1000
    * returns v exactly, so every gradient bit is a pure function of the
    * md5 bytes. The `perturbed` twin adds +6 (clamped) to pixel (3, 2),
    * feeding at most the two adjacent comparisons — ≤ 2 Hamming bits. */
  def md5GrayPng(seed: Long, perturbed: Boolean = false): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val g = md.digest(s"graft-dimg:$seed:$x:$y".getBytes("UTF-8"))(0) & 0xff
        val v = if (perturbed && x == 3 && y == 2) math.min(255, g + 6) else g
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual-hash stage: (media_id, phash, pixel_real). Decodable
    * images get the perceptual dHash (near-dup robust); everything else
    * the exact byte-content hash (exact-dup only). Downstream blocking
    * reuses the SimHash banded join ([[graft.operators.Dedup.simhashPairs]])
    * unchanged — one shuffle keyed by 16-bit band, never O(n²). */
  def imageDHash(items: Dataset[MediaItem])
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    items.mapPartitions(_.map { it =>
      dhash64(if (it.bytes == null) Array.emptyByteArray else it.bytes) match {
        case Some(h) => (it.media_id, h, true)
        case None => (it.media_id, byteContentHash(
          if (it.bytes == null) Array.emptyByteArray else it.bytes), false)
      }
    }).toDF("media_id", "phash", "pixel_real")
  }

  /** Decode stage: mapPartitions over typed rows, codec held per executor
    * (the Spark analog of the reference's per-worker lazy model init). */
  def decodeMeta(items: Dataset[MediaItem], codec: MediaCodec = StubCodec)
                (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    items.mapPartitions(_.map(codec.decode))
  }

  /** Relational frame-sample plan over decoded metadata: one row per
    * sampled frame index (stride `everyK`), no bytes involved. */
  def frameSamplePlan(meta: DataFrame, everyK: Long): DataFrame =
    meta.withColumn("frame_idx",
      explode(when(col("n_frames") >= 1,
        sequence(lit(0L), col("n_frames") - 1, lit(everyK)))
        .otherwise(array().cast("array<bigint>"))))

  /** Resize plan: aspect-preserving target dimensions capped at `maxSide`
    * (integer floor math — the metadata half of a resize stage; the pixel
    * half lives behind [[MediaCodec]] in a real deployment). Images
    * already within bounds pass through unscaled. */
  def resizePlan(meta: DataFrame, maxSide: Long): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxSide
    meta
      .withColumn("out_width",
        when(needs, floor(col("width") * maxSide / longest)).otherwise(col("width")).cast("long"))
      .withColumn("out_height",
        when(needs, floor(col("height") * maxSide / longest)).otherwise(col("height")).cast("long"))
      .withColumn("resized", needs)
  }

  case class AudioWindow(media_id: Long, window_idx: Long, n_samples: Long,
                         energy: Long, peak: Long)

  /** Audio windowed-energy stage — the silence-detection / VAD-gating
    * front end of an audio curation pipeline (segment on energy, drop
    * silent spans, route loud spans to transcription). STUB sample
    * decode: bytes are read as unsigned 8-bit PCM centered at 97 (the
    * corpus bytes are lowercase ASCII, so samples land near zero and
    * word boundaries spike) — a real deployment parses WAV/FLAC headers
    * and int16 frames behind the same signature. The Spark plumbing is
    * the real thing: typed flatMap fan-out (one row per window, ~n/win
    * rows), integer-exact energy/peak so any engine replays it, bytes
    * column-pruned everywhere downstream. */
  def audioEnergy(items: Dataset[MediaItem], win: Int)
                 (implicit spark: SparkSession): Dataset[AudioWindow] = {
    import spark.implicits._
    items.flatMap { it =>
      val b = if (it.bytes == null) Array.emptyByteArray else it.bytes
      val n = b.length
      val nWin = (n + win - 1) / win
      (0 until nWin).map { w =>
        val start = w * win
        val end = math.min(n, start + win)
        var e = 0L
        var p = 0L
        var i = start
        while (i < end) {
          val c = (b(i) & 0xff).toLong - 97L
          e += c * c
          if (math.abs(c) > p) p = math.abs(c)
          i += 1
        }
        AudioWindow(it.media_id, w.toLong, (end - start).toLong, e, p)
      }
    }
  }

  /** Feature-extract stub: fixed-size feature vector from bytes (real impl:
    * image embedding model). Deterministic: byte histogram projected to
    * `dim` buckets, L1-normalized. */
  def stubFeatures(items: Dataset[MediaItem], dim: Int = 16)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    items.map { it =>
      val hist = new Array[Double](dim)
      var i = 0
      while (i < it.bytes.length) { hist((it.bytes(i) & 0xff) % dim) += 1.0; i += 1 }
      val total = math.max(1.0, it.bytes.length.toDouble)
      (it.media_id, hist.map(_ / total).toSeq)
    }.toDF("media_id", "features")
  }
}
