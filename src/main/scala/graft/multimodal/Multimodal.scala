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
