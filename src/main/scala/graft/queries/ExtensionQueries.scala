package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Streaming + multimodal capability queries. The streaming transforms are
  * oracle-checked in batch mode (unified Dataset semantics); the streaming
  * execution path itself is covered by StreamingSpec. The multimodal stub
  * codec is deterministic from bytes, so even decode metadata is
  * oracle-backed. */
object ExtensionQueries {
  import Tables.table

  /** Tumbling 5-minute per-type window aggregation (batch = stream). */
  val streamWindowAgg = QueryDef("stream_window_agg",
    (s, dir) => EventStream.tumblingTypeCounts(table(s, dir, "events"), 300)
      .orderBy("window_start_epoch", "event_type"),
    Some("""SELECT (epoch_ns(ts) // 1000 // 1000000 // 300) * 300 AS window_start_epoch,
        event_type, COUNT(*) AS n_events,
        SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Inactivity-gap sessionization (10-minute gap). */
  val sessionizeQ = QueryDef("sessionize",
    (s, dir) => EventStream.sessionize(table(s, dir, "events"), 600)
      .withColumn("session_idx", col("session_idx").cast("long"))
      .orderBy("user_id", "session_idx"),
    Some("""WITH t AS (
        SELECT user_id, epoch_ns(ts) // 1000 // 1000000 AS t_sec,
               make_timestamp(epoch_ns(ts) // 1000) AS et
        FROM events),
      m AS (SELECT user_id, t_sec, et,
              LAG(t_sec) OVER (PARTITION BY user_id ORDER BY et) AS prev_t
            FROM t),
      s AS (SELECT user_id, t_sec, et,
              CASE WHEN prev_t IS NULL OR t_sec - prev_t > 600 THEN 1 ELSE 0 END AS new_session
            FROM m),
      x AS (SELECT user_id, t_sec,
              CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY et ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM s)
      SELECT user_id, session_idx, COUNT(*) AS n_events,
             MIN(t_sec) AS session_start_epoch, MAX(t_sec) AS session_end_epoch
      FROM x GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  private def mediaItems(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"),
      format_string("/media/%d.bin", col("doc_id")).as("path"),
      encode(col("text"), "UTF-8").as("bytes"))
      .as[Multimodal.MediaItem]
  }

  /** Binary-column decode via the stub codec (mapPartitions stage). */
  val multimodalMeta = QueryDef("multimodal_meta",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.decodeMeta(mediaItems(s, dir)).toDF()
        .select("media_id", "kind", "n_bytes", "width", "height", "n_frames", "checksum")
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
        CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
        CAST(strlen(text) AS BIGINT) AS n_bytes,
        64 + strlen(text) % 512 AS width,
        64 + (strlen(text) * 3) % 512 AS height,
        CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + strlen(text) % 240 END AS n_frames,
        CAST(list_sum([ascii(text[i]) for i in generate_series(1, length(text))]) AS BIGINT) AS checksum
      FROM documents ORDER BY media_id"""))

  /** Relational frame-sample plan over decoded metadata (stride 24). */
  val multimodalFrameSample = QueryDef("multimodal_frame_sample",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.frameSamplePlan(
          Multimodal.decodeMeta(mediaItems(s, dir)).toDF(), 24)
        .select("media_id", "frame_idx")
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH m AS (
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + strlen(text) % 240 END AS n_frames
        FROM documents)
      SELECT media_id, UNNEST(generate_series(0, n_frames - 1, 24)) AS frame_idx
      FROM m WHERE n_frames >= 1 ORDER BY media_id, frame_idx"""))

  val defs: Seq[QueryDef] = Seq(
    streamWindowAgg, sessionizeQ, multimodalMeta, multimodalFrameSample)
}
