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
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Batch twin of the stream-stream attribution join (24h window):
    * integer-µs arithmetic on both engines so timestamp precision can't
    * diverge. Streaming path: EventStream.streamingAttributionJoin
    * (watermarked both sides, bounded state — StreamingSinksSpec). */
  val streamIntervalJoin = QueryDef("stream_interval_join",
    (s, dir) => {
      val e = table(s, dir, "events")
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          expr("ts div 1000").as("click_us"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
          expr("ts div 1000").as("view_us"))
      c.join(v, col("user_id") === col("view_user") &&
          col("view_us").between(col("click_us") - 86400000000L, col("click_us")))
        .select("user_id", "click_id", "view_id")
        .orderBy("click_id", "view_id")
    },
    Some("""SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'view'
       AND epoch_ns(b.ts) // 1000 BETWEEN epoch_ns(a.ts) // 1000 - 86400000000 AND epoch_ns(a.ts) // 1000
      ORDER BY click_id, view_id"""))

  /** Stream-static dimension enrichment (batch twin; the streaming path
    * is [[EventStream.enrich]] on a file stream, proven stream == batch
    * in StreamingSinksSpec): events left-join the broadcast customer
    * dimension, unmatched facts enriched as 'unknown'. The dim is
    * filtered (c_custkey % 7 ≠ 0) so the unmatched path is non-vacuous
    * at every scale. */
  val streamEnrich = QueryDef("stream_enrich",
    (s, dir) => {
      val e = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val dims = table(s, dir, "customer")
        .filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      EventStream.enrich(e, dims)
        .select("event_id", "user_id", "event_type", "segment")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, e.event_type,
        COALESCE(c.c_mktsegment, 'unknown') AS segment
      FROM events e
      LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 <> 0) c
        ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""))

  /** Windowed top-k ("trending"): the 3 most frequent event types per
    * 5-minute tumbling window — the canonical streaming-analytics rank
    * (trending topics / hot keys / top error codes per interval). Built on
    * the SAME `tumblingTypeCounts` transform as `stream_window_agg`, so
    * the streaming path is the already-spec'd watermarked agg and the rank
    * is a per-window row_number (partition = one window, thousands of
    * them — never a global sort; StreamingSinksSpec proves the
    * stream-fed rank equals this batch twin). Ties break (count desc,
    * event_type asc) — total order, oracle-replayable. */
  val streamTopK = QueryDef("stream_topk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = EventStream.tumblingTypeCounts(table(s, dir, "events"), 300)
      val w = Window.partitionBy("window_start_epoch")
        .orderBy(col("n_events").desc, col("event_type").asc)
      counts.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("window_start_epoch"), col("rank"), col("event_type"),
          col("n_events"))
        .orderBy("window_start_epoch", "rank")
    },
    Some("""WITH c AS (
        SELECT (epoch_ns(ts) // 1000 // 1000000 // 300) * 300 AS window_start_epoch,
          event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2),
      r AS (SELECT window_start_epoch, event_type, n_events,
        ROW_NUMBER() OVER (PARTITION BY window_start_epoch
          ORDER BY n_events DESC, event_type ASC) AS rank
        FROM c)
      SELECT window_start_epoch, CAST(rank AS BIGINT) AS rank, event_type, n_events
      FROM r WHERE rank <= 3 ORDER BY window_start_epoch, rank"""))

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

  /** Batch twin certifying [[EventStream.streamingSessionize]]'s EXACT
    * emitted row set — the stateful flatMapGroupsWithState path under
    * the oracle. Emission rule: with a watermark delay wider than the
    * data's time span NO event-time timeout ever fires, so the stream
    * emits precisely the sessions CLOSED BY A SUCCESSOR — every session
    * except each user's last (the one still open at end-of-stream).
    * That set is a pure function of the batch gap rule: sessionize,
    * then drop each user's max session_idx. StreamingSinksSpec runs the
    * actual availableNow stream and pins row-for-row equality with this
    * query; the DuckDB oracle certifies the batch side, so the stateful
    * streaming path is transitively hash-certified. (The timeout-driven
    * eviction path stays covered by the existing bounded-delay spec —
    * its emitted set depends on Spark's watermark-vs-timeout boundary
    * semantics, which is exactly what an exact cross-engine oracle
    * should not encode.) */
  val streamSessionize = QueryDef("stream_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sess = EventStream.sessionize(table(s, dir, "events"), 600)
      val w = Window.partitionBy("user_id")
      sess.withColumn("last_idx", max(col("session_idx")).over(w))
        .filter(col("session_idx") < col("last_idx"))
        .select(col("user_id"), col("n_events"),
          col("session_start_epoch"), col("session_end_epoch"))
        .orderBy("user_id", "session_start_epoch")
    },
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
            FROM s),
      g AS (SELECT user_id, session_idx, COUNT(*) AS n_events,
              MIN(t_sec) AS session_start_epoch, MAX(t_sec) AS session_end_epoch
            FROM x GROUP BY user_id, session_idx),
      f AS (SELECT *, MAX(session_idx) OVER (PARTITION BY user_id) AS last_idx FROM g)
      SELECT user_id, n_events, session_start_epoch, session_end_epoch
      FROM f WHERE session_idx < last_idx
      ORDER BY user_id, session_start_epoch"""))

  private def mediaItems(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"),
      format_string("/media/%d.bin", col("doc_id")).as("path"),
      encode(col("text"), "UTF-8").as("bytes"))
      .as[Multimodal.MediaItem]
  }

  /** Binary-column decode via the real javax.imageio codec: actual image
    * bytes get decoded pixel dimensions; non-image payloads (all of this
    * synthetic corpus) deterministically fall back to the stub metadata,
    * which keeps the oracle replayable. */
  val multimodalMeta = QueryDef("multimodal_meta",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.decodeMeta(mediaItems(s, dir), Multimodal.ImageIoCodec).toDF()
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

  /** Audio windowed-energy/silence front end ([[Multimodal.audioEnergy]]):
    * one row per 50-sample window with integer-exact energy and peak —
    * the VAD-gating shape (segment on energy, drop silence, route loud
    * spans onward). The stub reads corpus bytes as centered 8-bit PCM;
    * the oracle replays every window arithmetic exactly. */
  val multimodalAudioEnergy = QueryDef("multimodal_audio_energy",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.audioEnergy(mediaItems(s, dir), win = 50).toDF()
        .select("media_id", "window_idx", "n_samples", "energy", "peak")
        .orderBy("media_id", "window_idx")
    },
    Some("""WITH b AS (SELECT doc_id AS media_id, text, CAST(strlen(text) AS BIGINT) AS n
        FROM documents),
      w AS (SELECT media_id, text, n,
              UNNEST(generate_series(0, CAST(FLOOR((n + 49) / 50.0) AS BIGINT) - 1)) AS window_idx
            FROM b WHERE n > 0),
      s AS (SELECT media_id, window_idx,
              [CAST(ascii(text[CAST(i AS INT)]) AS BIGINT) - 97
               for i in generate_series(window_idx * 50 + 1, LEAST(n, window_idx * 50 + 50))] AS cs
            FROM w)
      SELECT media_id, window_idx, CAST(len(cs) AS BIGINT) AS n_samples,
        CAST(list_sum([c * c for c in cs]) AS BIGINT) AS energy,
        CAST(list_max([abs(c) for c in cs]) AS BIGINT) AS peak
      FROM s ORDER BY media_id, window_idx"""))

  /** Aspect-preserving resize planning over decoded metadata (cap 256). */
  val multimodalResize = QueryDef("multimodal_resize",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.resizePlan(Multimodal.decodeMeta(mediaItems(s, dir)).toDF(), 256)
        .select("media_id", "width", "height", "out_width", "out_height", "resized")
        .orderBy("media_id")
    },
    Some("""WITH m AS (
        SELECT doc_id AS media_id,
          64 + strlen(text) % 512 AS width,
          64 + (strlen(text) * 3) % 512 AS height
        FROM documents),
      s AS (SELECT *, GREATEST(width, height) AS longest FROM m)
      SELECT media_id, width, height,
        CASE WHEN longest > 256 THEN CAST(FLOOR(width * 256 / longest) AS BIGINT) ELSE width END AS out_width,
        CASE WHEN longest > 256 THEN CAST(FLOOR(height * 256 / longest) AS BIGINT) ELSE height END AS out_height,
        longest > 256 AS resized
      FROM s ORDER BY media_id"""))

  /** As-of join: for each click, the latest prior view by the same user
    * (union + per-key window scan — no range explosion). Oracle: DuckDB's
    * native ASOF JOIN. */
  val asofJoinQ = QueryDef("join_asof",
    (s, dir) => {
      // DuckDB reads TIMESTAMP(NANOS) parquet at microsecond precision, so
      // truncate our nanosecond longs to µs for identical instants.
      val e = table(s, dir, "events")
        .withColumn("ts", col("ts") - col("ts") % 1000)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.AsOfJoin.asof(clicks, views, "user_id", "ts", "ts", "event_id", "event_id")
        .select(col("user_id"), col("event_id"), col("ts").as("t_click"),
          col("matched_event_id").as("matched_view"), col("asof_lag"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      views AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
      SELECT c.user_id, c.event_id, epoch_ns(c.ts) AS t_click,
        v.event_id AS matched_view,
        epoch_ns(c.ts) - epoch_ns(v.ts) AS asof_lag
      FROM clicks c ASOF LEFT JOIN views v
        ON c.user_id = v.user_id AND v.ts <= c.ts
      ORDER BY c.user_id, c.event_id"""))

  /** Corpus statistics: per-language doc counts, distinct sources, mean
    * token count, exact interpolated median chars. */
  val corpusStats = QueryDef("corpus_stats",
    (s, dir) => table(s, dir, "documents")
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        expr("percentile(n_chars, 0.5)").as("median_chars"))
      .orderBy("lang"),
    Some("""SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
        ROUND(AVG(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE)), 6) AS avg_tokens,
        quantile_cont(n_chars, 0.5) AS median_chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** JSON property extraction from the events props column.
    * r15 sort-early: range the bare (event_id, props) scan first — the
    * per-row JSON parse otherwise runs twice (range sampling) on the
    * single scan core — and restore order in-partition. */
  val parseJsonProps = QueryDef("parse_json_props",
    (s, dir) => graft.ops.Parallelism.byRange(
        table(s, dir, "events").select(col("event_id"), col("props")),
        col("event_id"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .sortWithinPartitions("event_id"),
    Some("""SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
      FROM events ORDER BY event_id"""))

  /** Running per-user total (decimal-exact cumulative window). */
  val windowRunningSum = QueryDef("window_running_sum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w)
            .cast("double"))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events ORDER BY user_id, event_id"""))

  /** Perceptual image dedup: dHash per media item (pixel-real for
    * decodable images; exact byte-content hash otherwise), then the
    * banded Hamming blocking join reused from text SimHash.
    *
    * The synthetic corpus carries text bytes with no duplicate content,
    * so the unplanted join finds nothing — and a 0-row rows-only check
    * asserts nothing. Every `media_id % 50 == 0` is therefore replaced by
    * a deterministic noise PNG plus a twin (`media_id + 10000`) with one
    * perturbed pixel: the twins' dHashes sit within ≤2 Hamming bits, so
    * each planted id emits exactly its (id, id+10000) pair through the
    * pixel-REAL decode→downsample→dHash path. Engine hashing →
    * rows-only; DedupSimilaritySpec pins the exact expected pair set. */
  val dedupImageDhash = QueryDef("dedup_image_dhash",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val planted = mediaItems(s, dir).filter(_.media_id < 300).flatMap { it =>
        if (it.media_id % 50 == 0)
          Seq(it.copy(bytes = Multimodal.syntheticPng(it.media_id)),
            Multimodal.MediaItem(it.media_id + 10000, it.kind, it.path,
              Multimodal.syntheticPng(it.media_id, perturbed = true)))
        else Seq(it)
      }
      val hashes = Multimodal.imageDHash(planted)
      graft.operators.Dedup.simhashPairs(hashes, "media_id", "phash", maxHamming = 4)
        .orderBy("id_a", "id_b")
    },
    None)

  private def imageDhashOracleSql: String =
    """WITH ids AS (
        SELECT doc_id AS media_id, 0 AS pert, doc_id AS seed
        FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 10000, 1, doc_id
        FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0),
      cells AS (SELECT media_id, pert, seed, gx.i AS x, gy.i AS y
                FROM ids, generate_series(0, 8) gx(i), generate_series(0, 7) gy(i)),
      px AS (SELECT media_id, x, y,
               CASE WHEN pert = 1 AND x = 3 AND y = 2
                    THEN LEAST(255, CAST(('0x' || substring(md5('graft-dimg:' || CAST(seed AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':' || CAST(y AS VARCHAR)), 1, 2)) AS INT) + 6)
                    ELSE CAST(('0x' || substring(md5('graft-dimg:' || CAST(seed AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':' || CAST(y AS VARCHAR)), 1, 2)) AS INT)
               END AS g
             FROM cells),
      cmp AS (SELECT a.media_id, a.y * 8 + a.x AS bit
              FROM px a JOIN px b ON a.media_id = b.media_id AND a.y = b.y AND b.x = a.x + 1
              WHERE a.x < 8 AND a.g < b.g),
      hs AS (SELECT ids.media_id,
               CAST(COALESCE(SUM(CAST(1 AS UBIGINT) << cmp.bit), 0) AS UBIGINT) AS h
             FROM ids LEFT JOIN cmp USING (media_id) GROUP BY ids.media_id),
      bands AS (SELECT media_id, h, gb.i AS band_idx,
                  (h >> (gb.i * 16)) & 65535 AS band_val
                FROM hs, generate_series(0, 3) gb(i)),
      cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 a.h AS ha, b.h AS hb
               FROM bands a JOIN bands b
                 ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                    AND a.media_id < b.media_id)
      SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(ha, hb)) <= 4
      ORDER BY id_a, id_b"""

  /** Oracle COMPANION for dedup_image_dhash (the dedup_greedy_oracle
    * pattern): the REAL decode → downsample → dHash → banded-Hamming
    * machinery runs over 9×8 grayscale PNGs whose pixels are md5-derived
    * ([[Multimodal.md5GrayPng]]) — at the dHash's own geometry the resize
    * is the identity map, so every gradient bit is a pure function of the
    * md5 hex an external engine can read, and DuckDB replays hashes,
    * bands, the candidate join and the Hamming verdicts bit-for-bit.
    * A +6-on-one-pixel twin (≤ 2 Hamming bits) is planted for every 10th
    * id. The arbitrary-geometry resize path stays covered by
    * dedup_image_dhash + ImageOpsSpec — this row moves the HASH + JOIN
    * machinery under the hash oracle. */
  val dedupImageDhashOracle = QueryDef("dedup_image_dhash_oracle",
    (s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val items = table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200).as[Long]
        .flatMap { id =>
          val base = Multimodal.MediaItem(id, "image", s"/synth/$id.png",
            Multimodal.md5GrayPng(id))
          if (id % 10 == 0)
            Seq(base, Multimodal.MediaItem(id + 10000, "image",
              s"/synth/${id}_twin.png", Multimodal.md5GrayPng(id, perturbed = true)))
          else Seq(base)
        }
      val hashes = Multimodal.imageDHash(items)
      graft.operators.Dedup.simhashPairs(hashes, "media_id", "phash", maxHamming = 4)
        .orderBy("id_a", "id_b")
    },
    Some(imageDhashOracleSql))

  /** CLIP-style multimodal pair curation — the LAION recipe (Schuhmann et
    * al., 2021): keep an (image, caption) pair only if the caption passes
    * a language gate AND the image-embedding/text-embedding cosine clears
    * the alignment threshold (LAION's 0.28). The text side is the
    * embeddings table keyed by doc_id; the image embedding is synthesized
    * deterministically from it — doc_id % 3 = 0 pairs get a near-aligned
    * perturbation (cosine ≈ +0.999998), the rest a negated perturbation
    * (cosine ≈ −0.999998) — so BOTH gate classes fire at every scale and
    * every float in the chain is IEEE-replayable (the real pipeline
    * swaps the synthesis for a model-seam column; the gate logic, join
    * shape and verdict plumbing are the production path). Scale shape:
    * one co-partitioned equi-join (caption ↔ embedding on the shared
    * key) plus a narrow map — no extra shuffle; the reason column is the
    * first-failing-stage pattern of pipeline_select. */
  /** The deterministic image-embedding synthesis shared by
    * `multimodal_clip_filter` and `pipeline_multimodal` — aligned
    * perturbation for doc_id % 3 = 0 pairs, negated for the rest (a model
    * seam fills this column in production; the gate/funnel plumbing is
    * the product). References `doc_id` and `embedding` of the input row. */
  private def clipImg = transform(col("embedding"), (x, i) =>
    (x.cast("double") * (lit(1.0) + ((i % 5) - 2).cast("double") / lit(1000.0)) *
      when(col("doc_id") % 3 === 0, lit(1.0)).otherwise(lit(-1.0))).cast("float"))

  val multimodalClipFilter = QueryDef("multimodal_clip_filter",
    (s, dir) => {
      import graft.operators.Similarity
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val caps = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      caps.join(emb, "doc_id")
        .withColumn("img", clipImg)
        .withColumn("clip_sim", Similarity.cosine(col("embedding"), col("img")))
        .withColumn("lang_ok", when(col("lang") === "en", 1).otherwise(0))
        .withColumn("sim_ok", when(col("clip_sim") >= 0.28, 1).otherwise(0))
        .select(col("doc_id"), col("lang"), col("clip_sim"),
          col("lang_ok"), col("sim_ok"),
          (col("lang_ok") * col("sim_ok")).as("kept"),
          when(col("lang_ok") === 0, "lang")
            .when(col("sim_ok") === 0, "low_sim")
            .otherwise("kept").as("reason"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT d.doc_id, d.lang, e.embedding,
          [CAST(CAST(e.embedding[i] AS DOUBLE) * (1.0 + CAST(((i - 1) % 5) - 2 AS DOUBLE) / 1000.0) *
                (CASE WHEN d.doc_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS FLOAT)
           for i in generate_series(1, len(e.embedding))] AS img
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      n AS (SELECT doc_id, lang,
          sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, b) -> a + b)) AS ne,
          sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in img], (a, b) -> a + b)) AS ni,
          list_reduce([CAST(embedding[i] AS DOUBLE) * CAST(img[i] AS DOUBLE)
                       for i in generate_series(1, len(embedding))], (a, b) -> a + b) AS dp
        FROM p),
      s AS (SELECT doc_id, lang,
          CASE WHEN ne > 0 AND ni > 0 THEN dp / (ne * ni) ELSE 0.0 END AS clip_sim
        FROM n)
      SELECT doc_id, lang, clip_sim,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lang_ok,
        CASE WHEN clip_sim >= 0.28 THEN 1 ELSE 0 END AS sim_ok,
        (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) *
          (CASE WHEN clip_sim >= 0.28 THEN 1 ELSE 0 END) AS kept,
        CASE WHEN lang <> 'en' THEN 'lang'
             WHEN clip_sim < 0.28 THEN 'low_sim'
             ELSE 'kept' END AS reason
      FROM s ORDER BY doc_id"""))

  /** Shared multimodal-funnel stages — the REGISTERED query and ScaleProbe
    * both call this on a (doc_id, lang, text, embedding) frame:
    * CLIP gate → caption exact dedup among survivors → char-balanced
    * snake sharding of the kept set. */
  def multimodalFunnel(paired: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.operators.{Dedup, Sharding, Similarity}
    val scored = paired
      .withColumn("img", clipImg)
      .withColumn("clip_sim", Similarity.cosine(col("embedding"), col("img")))
      .withColumn("gate_ok",
        when(col("lang") === "en" && col("clip_sim") >= 0.28, 1).otherwise(0))
      .select("doc_id", "lang", "text", "clip_sim", "gate_ok")
      .localCheckpoint() // read by the kept chain and the final verdict join
    val k = scored.filter(col("gate_ok") === 1)
      .select(col("doc_id"), md5(Dedup.bagOfWordsKey(col("text"))).as("ch"),
        length(col("text")).cast("long").as("n_chars"))
    val grp = k.groupBy("ch").agg(min(col("doc_id")).as("keep_id"))
    val kk = k.join(grp, "ch")
      .select(col("doc_id"), col("n_chars"),
        when(col("doc_id") === col("keep_id"), 1).otherwise(0).as("dup_ok"))
    val sh = Sharding.snakeShards(
        kk.filter(col("dup_ok") === 1).select("doc_id", "n_chars"),
        nShards = 4, "n_chars", "doc_id")
      .select(col("doc_id"), col("shard"))
    scored.select("doc_id", "lang", "clip_sim", "gate_ok")
      .join(kk.select("doc_id", "dup_ok"), Seq("doc_id"), "left")
      .join(sh, Seq("doc_id"), "left")
      .select(col("doc_id"), col("clip_sim"), col("gate_ok"),
        coalesce(col("dup_ok"), lit(0)).as("dup_ok"),
        coalesce(col("shard"), lit(-1L)).as("shard"),
        when(col("gate_ok") === 0,
            when(col("lang") =!= "en", "lang").otherwise("low_sim"))
          .when(coalesce(col("dup_ok"), lit(0)) === 0, "dup")
          .otherwise("kept").as("reason"))
  }

  /** Composed multimodal curation funnel — the pipeline_pretrain analog
    * for (image, caption) pair corpora (the LAION assembly line): CLIP
    * alignment gate (language AND cosine threshold) → exact caption dedup
    * among gate survivors (bag-of-words key — dedup must run on the
    * POST-gate population or dropped pairs elect keepers) → char-balanced
    * snake sharding of the kept set. Per pair: stage verdicts, a
    * first-failing-stage reason, and the shard (−1 dropped). All four
    * reason classes fire at every scale (sf0.01: 282 lang / 143 low_sim /
    * 4 dup / 71 kept). Scale shape: one co-partitioned pair join + narrow
    * gate, one hash-agg dedup over survivors, one distributed snake sort
    * over the kept minority — each stage the SAME builder its standalone
    * query uses. */
  val pipelineMultimodal = QueryDef("pipeline_multimodal",
    (s, dir) => {
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val caps = table(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      multimodalFunnel(caps.join(emb, "doc_id")).orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT d.doc_id, d.lang, d.text, e.embedding,
          [CAST(CAST(e.embedding[i] AS DOUBLE) * (1.0 + CAST(((i - 1) % 5) - 2 AS DOUBLE) / 1000.0) *
                (CASE WHEN d.doc_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS FLOAT)
           for i in generate_series(1, len(e.embedding))] AS img
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      n AS (SELECT doc_id, lang, text,
          sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding], (a, b) -> a + b)) AS ne,
          sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in img], (a, b) -> a + b)) AS ni,
          list_reduce([CAST(embedding[i] AS DOUBLE) * CAST(img[i] AS DOUBLE)
                       for i in generate_series(1, len(embedding))], (a, b) -> a + b) AS dp
        FROM p),
      g AS (SELECT doc_id, lang, text,
          CASE WHEN ne > 0 AND ni > 0 THEN dp / (ne * ni) ELSE 0.0 END AS clip_sim,
          CASE WHEN lang = 'en' AND (CASE WHEN ne > 0 AND ni > 0 THEN dp / (ne * ni) ELSE 0.0 END) >= 0.28
               THEN 1 ELSE 0 END AS gate_ok
        FROM n),
      k AS (SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))), ' ')) AS ch,
          CAST(length(text) AS BIGINT) AS n_chars
        FROM g WHERE gate_ok = 1),
      grp AS (SELECT ch, MIN(doc_id) AS keep_id FROM k GROUP BY ch),
      kk AS (SELECT k.doc_id, k.n_chars,
               CASE WHEN k.doc_id = grp.keep_id THEN 1 ELSE 0 END AS dup_ok
             FROM k JOIN grp USING (ch)),
      r AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS rank
            FROM kk WHERE dup_ok = 1),
      sh AS (SELECT doc_id,
               CAST(CASE WHEN (rank // 4) % 2 = 0 THEN rank % 4
                         ELSE 3 - (rank % 4) END AS BIGINT) AS shard
             FROM r)
      SELECT g.doc_id, g.clip_sim, g.gate_ok,
        COALESCE(kk.dup_ok, 0) AS dup_ok,
        COALESCE(sh.shard, -1) AS shard,
        CASE WHEN g.gate_ok = 0 THEN (CASE WHEN g.lang <> 'en' THEN 'lang' ELSE 'low_sim' END)
             WHEN COALESCE(kk.dup_ok, 0) = 0 THEN 'dup'
             ELSE 'kept' END AS reason
      FROM g LEFT JOIN kk USING (doc_id) LEFT JOIN sh USING (doc_id)
      ORDER BY g.doc_id"""))

  val defs: Seq[QueryDef] = Seq(
    streamWindowAgg, streamTopK, streamEnrich, sessionizeQ, streamSessionize,
    streamIntervalJoin, multimodalMeta,
    multimodalFrameSample, multimodalResize, multimodalAudioEnergy,
    asofJoinQ, corpusStats, parseJsonProps, windowRunningSum, dedupImageDhash,
    dedupImageDhashOracle, multimodalClipFilter, pipelineMultimodal)
}
