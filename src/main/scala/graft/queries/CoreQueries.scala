package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VideoFunctions._
import graft.operators.Tiling

/** One registered query per operator capability (SURVEY.md §2). Each query
  * has a Spark impl and an equivalent DuckDB oracle on the same parquet.
  *
  * Determinism rules (both sides): full ORDER BY with tie-breaks on
  * non-null keys; money sums via DECIMAL(18,2) (exact, order-independent);
  * averages rounded; int-valued double sums left as doubles (exact in IEEE
  * for |v| < 2^53); all explicit FLOOR before int casts (Spark truncates,
  * DuckDB rounds — never rely on bare CAST of fractional doubles).
  */
case class QueryDef(name: String,
                    spark: (SparkSession, String) => DataFrame,
                    oracle: Option[String])

object CoreQueries {
  import Tables.{table, manifest, manifestSql}

  /** Flagship pricing-summary aggregation (TPC-H Q1 shape): map-side
    * partial agg → single shuffle on the two low-cardinality group keys;
    * at 100 TB this scans+aggregates with no join and ~9 output rows. */
  val q1Agg = QueryDef("q1_agg",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_base_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** F1 dead-letter min-duration gate: rejected rows kept with status+reason.
    * Ref: pipeline/cut_30min.py:38-43. */
  val gateMinDuration = QueryDef("gate_min_duration",
    (s, dir) => manifest(s, dir).select(
      col("video_id"), col("file_path"), col("total_duration"),
      when(col("total_duration") < 300, 0).otherwise(1).as("status"),
      when(col("total_duration") < 300, "duration too short").as("reason"))
      .orderBy("video_id"),
    Some(s"""WITH manifest AS ($manifestSql)
      SELECT video_id, file_path, total_duration,
        CASE WHEN total_duration < 300 THEN 0 ELSE 1 END AS status,
        CASE WHEN total_duration < 300 THEN 'duration too short' END AS reason
      FROM manifest ORDER BY video_id"""))

  private val tileOracle =
    s"""WITH manifest AS ($manifestSql),
      exploded AS (
        SELECT video_id, total_duration,
          UNNEST(generate_series(0, CAST(CEIL(total_duration / 300.0) AS BIGINT) - 1)) AS seg0
        FROM manifest WHERE total_duration > 0),
      segs AS (
        SELECT video_id, seg0 + 1 AS seg_idx, seg0 * 300.0 AS start_time,
          LEAST(total_duration, seg0 * 300.0 + 300.0) AS end_time,
          LEAST(total_duration, seg0 * 300.0 + 300.0) - seg0 * 300.0 AS duration
        FROM exploded)"""

  /** G1/G3 fixed-duration tiling (segment_duration=300s, min=60s).
    * Ref: common/video/scene_segmenter_op.py:102-111.
    * r15 shape: tile above the pre-ranged manifest, restore the total
    * order in-partition — the explode runs once, distributed, instead of
    * twice on the scan core (range sampling re-executes the sort child). */
  val tileSegments = QueryDef("tile_segments",
    (s, dir) => Tiling.tileSegments(Tables.manifestRanged(s, dir), "total_duration", 300.0, 60.0)
      .select("video_id", "seg_idx", "start_time", "end_time", "duration")
      .sortWithinPartitions("video_id", "seg_idx"),
    Some(s"""$tileOracle
      SELECT video_id, seg_idx, start_time, end_time, duration
      FROM segs WHERE duration >= 60.0 ORDER BY video_id, seg_idx"""))

  /** F2 min-segment-length filter (drop short trailing slices at 150s).
    * Ref: common/video/scene_segmenter_op.py:104-111; pipeline/cut_ruidi.py:55-56. */
  val filterMinSeglen = QueryDef("filter_min_seglen",
    (s, dir) => Tiling.tileSegments(Tables.manifestRanged(s, dir), "total_duration", 300.0, 0.0)
      .filter(col("duration") >= 150.0)
      .select("video_id", "seg_idx", "duration")
      .sortWithinPartitions("video_id", "seg_idx"),
    Some(s"""$tileOracle
      SELECT video_id, seg_idx, duration
      FROM segs WHERE duration >= 150.0 ORDER BY video_id, seg_idx"""))

  /** F10/A5 per-file summary (file, status, segments_count) — left join keeps
    * zero-segment files. Ref: pipeline/cut_30min.py:50-51. */
  val projectSummary = QueryDef("project_summary",
    (s, dir) => {
      // r15: pre-ranged manifest shared by both join sides (one reused
      // exchange; the tile explode runs distributed)
      val m = Tables.manifestRanged(s, dir)
      val counts = Tiling.tileSegments(m, "total_duration", 300.0, 60.0)
        .groupBy("video_id").agg(count(lit(1)).as("segments_count"))
      m.join(counts, Seq("video_id"), "left")
        .select(col("video_id"), col("file_path"),
          when(col("total_duration") >= 60, 1).otherwise(0).as("status"),
          coalesce(col("segments_count"), lit(0L)).as("segments_count"))
        .orderBy("video_id")
    },
    Some(s"""$tileOracle
      SELECT m.video_id, m.file_path,
        CASE WHEN m.total_duration >= 60 THEN 1 ELSE 0 END AS status,
        COALESCE(c.cnt, 0) AS segments_count
      FROM manifest m LEFT JOIN (
        SELECT video_id, COUNT(*) AS cnt FROM segs WHERE duration >= 60.0 GROUP BY video_id) c
      USING (video_id) ORDER BY m.video_id"""))

  /** S8 deterministic save-path generation.
    * Ref: common/io/generate_save_path_op.py:25-31. */
  val genSavePathQ = QueryDef("gen_save_path",
    // Sort BEFORE projecting the path strings: the expensive per-segment
    // string assembly must sit above the sort (evaluated once), not below
    // it (evaluated twice under range sampling). ~2.3x on the sf0.1 bench.
    // r15: the range exchange moved below the tiling too (manifestRanged +
    // in-partition sort), so the explode also runs once, distributed.
    (s, dir) => Tiling.tileSegments(Tables.manifestRanged(s, dir), "total_duration", 300.0, 60.0)
      .sortWithinPartitions("video_id", "seg_idx")
      .select(col("video_id"), col("seg_idx"),
        genSaveDir("/tmp/pipeline_out", col("file_path")).as("save_dir"),
        genSavePath("/tmp/pipeline_out", col("file_path"), col("seg_idx"),
          col("start_time"), col("duration")).as("out_path")),
    Some(s"""$tileOracle,
      kept AS (SELECT s.*, m.file_path FROM segs s JOIN manifest m USING (video_id)
               WHERE s.duration >= 60.0),
      named AS (SELECT *, regexp_replace(regexp_extract(file_path, '([^/]+)$$', 1), '\\.[^.]*$$', '') AS name FROM kept)
      SELECT video_id, seg_idx,
        printf('/tmp/pipeline_out/%s', name) AS save_dir,
        printf('/tmp/pipeline_out/%s/%s_seg%d_%d_%d.mp4', name, name, seg_idx,
               CAST(FLOOR(start_time) AS BIGINT), CAST(FLOOR(duration) AS BIGINT)) AS out_path
      FROM named ORDER BY video_id, seg_idx"""))

  /** Path basename/stem scalar fns. Ref: common/io/generate_save_path_op.py:26-27. */
  val pathBasenameQ = QueryDef("path_basename",
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"),
        format_string("/data/%s/doc_%d.txt", col("source"), col("doc_id")).as("path"))
      .withColumn("base", pathBasename(col("path")))
      .withColumn("stem", pathStem(col("path")))
      .orderBy("doc_id"),
    Some("""WITH p AS (SELECT doc_id, printf('/data/%s/doc_%d.txt', source, doc_id) AS path FROM documents)
      SELECT doc_id, path, regexp_extract(path, '([^/]+)$', 1) AS base,
        regexp_replace(regexp_extract(path, '([^/]+)$', 1), '\.[^.]*$', '') AS stem
      FROM p ORDER BY doc_id"""))

  /** HH-MM-SS label. Ref: common/video/scene_segmenter_op.py:76-78. */
  val fmtTimeLabelQ = QueryDef("fmt_time_label",
    (s, dir) => Tables.manifestRanged(s, dir)
      .sortWithinPartitions("video_id")
      .select(col("video_id"), fmtTimeLabel(col("total_duration")).as("time_label")),
    Some(s"""WITH manifest AS ($manifestSql),
      t AS (SELECT video_id, CAST(FLOOR(total_duration) AS BIGINT) AS ts FROM manifest)
      SELECT video_id, printf('%02d-%02d-%02d', ts // 3600, (ts % 3600) // 60, ts % 60) AS time_label
      FROM t ORDER BY video_id"""))

  /** ffprobe `a/b` rational parse. Ref: common/video/video_probe_op.py:29-34. */
  val parseRationalQ = QueryDef("parse_rational",
    // Sort first, derive strings above it (see gen_save_path note).
    (s, dir) => table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .orderBy("l_orderkey", "l_linenumber")
      .select(col("l_orderkey"), col("l_linenumber"),
        format_string("%d/%d", col("l_partkey"), col("l_suppkey") + 1).as("rat"))
      .withColumn("fps", parseRational(col("rat"))),
    Some("""WITH r AS (SELECT l_orderkey, l_linenumber,
        printf('%d/%d', l_partkey, l_suppkey + 1) AS rat FROM lineitem)
      SELECT l_orderkey, l_linenumber, rat,
        CASE WHEN CAST(string_split(rat, '/')[2] AS DOUBLE) > 0
             THEN CAST(string_split(rat, '/')[1] AS DOUBLE) / CAST(string_split(rat, '/')[2] AS DOUBLE)
             ELSE 0.0 END AS fps
      FROM r ORDER BY l_orderkey, l_linenumber"""))

  /** L12 duration resolution (explicit duration else end-start).
    * Ref: common/video/ffmpeg_cut_op.py:79-95. */
  val resolveDurationQ = QueryDef("resolve_duration",
    (s, dir) => table(s, dir, "events")
      .select(col("event_id"),
        when(col("event_id") % 3 === 0, lit(null).cast("double")).otherwise(col("value")).as("duration"),
        lit(1.5).as("start_time"),
        (col("value") + 1.5).as("end_time"))
      .withColumn("resolved", resolveDuration(col("duration"), col("start_time"), col("end_time")))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS duration,
        CAST(1.5 AS DOUBLE) AS start_time, value + 1.5 AS end_time,
        COALESCE(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END, (value + 1.5) - 1.5) AS resolved
      FROM events ORDER BY event_id"""))

  /** M1 duration := frames/fps with zero-fps guard.
    * Ref: common/video/video_info_op.py:26-32. */
  val deriveDurationQ = QueryDef("derive_duration",
    (s, dir) => table(s, dir, "events")
      .select(col("event_id"),
        floor(col("value") * 1000).cast("long").as("frame_count"),
        when(col("event_id") % 10 === 0, lit(0.0))
          .otherwise(lit(24.0) + (col("event_id") % 5).cast("double")).as("fps"))
      .withColumn("total_duration", deriveDuration(col("frame_count"), col("fps")))
      .orderBy("event_id"),
    Some("""WITH f AS (SELECT event_id,
        CAST(FLOOR(value * 1000) AS BIGINT) AS frame_count,
        CASE WHEN event_id % 10 = 0 THEN 0.0 ELSE 24.0 + CAST(event_id % 5 AS DOUBLE) END AS fps
      FROM events)
      SELECT event_id, frame_count, fps,
        CASE WHEN fps > 0 THEN frame_count / fps ELSE 0.0 END AS total_duration
      FROM f ORDER BY event_id"""))

  private val framesCtes =
    s"""manifest AS ($manifestSql),
      f AS (SELECT video_id, CAST(FLOOR(total_duration * 24) AS BIGINT) AS total_frames
            FROM manifest WHERE video_id % 100 = 0)"""
  private val framesSql = s"WITH $framesCtes"

  private def framesDf(s: SparkSession, dir: String): DataFrame =
    manifest(s, dir).filter(col("video_id") % 100 === 0)
      .select(col("video_id"), floor(col("total_duration") * 24).cast("long").as("total_frames"))

  /** [[framesDf]] over the pre-ranged manifest (r15 sort-early shape):
    * samplers explode above the exchange and restore order in-partition. */
  private def framesRangedDf(s: SparkSession, dir: String): DataFrame =
    Tables.manifestRanged(s, dir).filter(col("video_id") % 100 === 0)
      .select(col("video_id"), floor(col("total_duration") * 24).cast("long").as("total_frames"))

  /** G4 every-k frame sampler (k=50). Ref: common/video/decord_reader_op.py:43-48. */
  val sampleEveryKQ = QueryDef("sample_every_k",
    (s, dir) => Tiling.sampleEveryK(framesRangedDf(s, dir), "total_frames", 50)
      .select("video_id", "frame_idx").sortWithinPartitions("video_id", "frame_idx"),
    Some(s"""$framesSql
      SELECT video_id, UNNEST(generate_series(0, total_frames - 1, 50)) AS frame_idx
      FROM f WHERE total_frames >= 1 ORDER BY video_id, frame_idx"""))

  /** G4 last-n frame sampler (n=240). Ref: common/video/decord_reader_op.py:51-57. */
  val sampleLastNQ = QueryDef("sample_last_n",
    (s, dir) => Tiling.sampleLastN(framesRangedDf(s, dir), "total_frames", 240)
      .select("video_id", "frame_idx").sortWithinPartitions("video_id", "frame_idx"),
    Some(s"""$framesSql
      SELECT video_id, UNNEST(generate_series(GREATEST(0, total_frames - 240), total_frames - 1)) AS frame_idx
      FROM f WHERE total_frames >= 1 ORDER BY video_id, frame_idx"""))

  /** G2 recursive span bisection (frames in [min,max] after midpoint splits).
    * Ref: common/video/scene_segmenter_op.py:22-41. */
  val bisectSpansQ = QueryDef("bisect_spans",
    (s, dir) => Tiling.bisectSpans(
        framesDf(s, dir).filter(col("total_frames") >= 1)
          .withColumn("span_s", lit(0L)).withColumn("span_e", col("total_frames")),
        "span_s", "span_e", 1200L, 9000L, maxDepth = 8)
      .select("video_id", "span_start", "span_end", "span_len")
      .orderBy("video_id", "span_start"),
    Some(s"""WITH RECURSIVE $framesCtes,
      spans AS (
        SELECT video_id, CAST(0 AS BIGINT) AS s, total_frames AS e
        FROM f WHERE total_frames >= 1
        UNION ALL
        SELECT video_id,
          CASE WHEN side = 0 THEN s ELSE ((s + e) // 2) + 1 END AS s,
          CASE WHEN side = 0 THEN (s + e) // 2 ELSE e END AS e
        FROM spans, (SELECT UNNEST([0, 1]) AS side)
        WHERE e - s > 9000)
      SELECT video_id, s AS span_start, e AS span_end, e - s AS span_len
      FROM spans WHERE e - s >= 1200 AND e - s <= 9000
      ORDER BY video_id, span_start"""))

  /** Shot-boundary detection — the classic video-curation segmenter the
    * tiling ops (G1–G4) deliberately don't do: fixed-duration tiles cut
    * MID-SCENE, while a clip-training corpus wants cuts at content
    * changes. Per video, a sampled frame-feature stream; a frame starts a
    * new shot when its L1 feature distance to the previous sampled frame
    * crosses a threshold; shots roll up to (start, end, n_frames) spans.
    *
    * The FEATURES here are md5-synthesized (the model-fake discipline:
    * piecewise-constant per md5-chosen scene, dim 0 guarantees ≥ 32
    * separation across consecutive scenes, per-frame jitter ≤ 1 per dim
    * keeps within-shot distance ≤ 4 — threshold 16 splits the classes
    * with margin), so DuckDB replays every distance, boundary vote and
    * span; a production run swaps the feature columns for real
    * embeddings and keeps the operator unchanged.
    *
    * Scale shape: one narrow frame explode (fan-out ∝ duration), ONE
    * window keyed by video_id (per-key row count bounded by the sampled
    * frame cap — lag and the running boundary sum share the single
    * window spec), one partial-agg rollup. Parallel across videos; no
    * unpartitioned window, no loop join (the registry audits hold). */
  val shotBoundariesQ = QueryDef("shot_boundaries",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Dedup.md5Hash60
      // r15: hash-repartition the (tiny) video list by the window key
      // BEFORE the frame explode — the md5 feature synthesis then runs
      // distributed above the exchange the window needs anyway (same
      // Exchange count; it was all on the single scan core before), and
      // the downstream groupBy(video_id, shot_id) reuses the partitioning
      // (video_id ⊂ grouping keys). 4x on the sf0.1 bench.
      val vids = manifest(s, dir)
        .filter(col("video_id") % 50 === 0 && col("total_duration") > 0)
        .select(col("video_id"),
          least(floor(col("total_duration") * 24).cast("long"), lit(2390L)).as("max_f"))
        .transform(graft.ops.Parallelism.byHash(_, col("video_id")))
      val frames = vids
        .select(col("video_id"), explode(sequence(lit(0L), col("max_f"), lit(10L))).as("fidx"))
        .withColumn("shot_len",
          md5Hash60(concat(lit("sb:len:"), col("video_id").cast("string"))) % 80 + 40)
        .withColumn("scene", expr("fidx div shot_len"))
      // One md5 per frame row and one per (video, scene), bit-sliced into
      // the four jitters (bits 0..3) and three 5-bit base fields — codegen
      // subexpression elimination evaluates each hash once, so fixture
      // synthesis costs 3 hashes/row instead of 7 while the scene-margin
      // law (within-shot dist ≤ 4, cross-scene ≥ 31) is unchanged: jitters
      // stay in {0,1}, bases stay multiples of 32.
      val hf = md5Hash60(concat(lit("sb:j:"),
        col("video_id").cast("string"), lit(":"), col("fidx").cast("string")))
      val hs = md5Hash60(concat(lit("sb:f:"),
        col("video_id").cast("string"), lit(":"), col("scene").cast("string")))
      def jit(i: Int) = shiftright(hf, i) % 2
      def base(i: Int) = (shiftright(hs, 5 * i) % 32) * 32
      val feat = frames.select(col("video_id"), col("fidx"),
        ((col("scene") % 31 + 1) * 32 + jit(0)).as("d0"),
        (base(1) + jit(1)).as("d1"),
        (base(2) + jit(2)).as("d2"),
        (base(3) + jit(3)).as("d3"))
      val w = Window.partitionBy("video_id").orderBy("fidx")
      val dist = (0 to 3)
        .map(i => abs(col(s"d$i") - lag(col(s"d$i"), 1).over(w)))
        .reduce(_ + _)
      feat.withColumn("dist", dist)
        .withColumn("boundary",
          when(col("dist").isNull || col("dist") >= 16, 1L).otherwise(0L))
        .withColumn("shot_id", sum(col("boundary"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
        .groupBy("video_id", "shot_id")
        .agg(min(col("fidx")).as("start_fidx"), max(col("fidx")).as("end_fidx"),
          count(lit(1)).as("n_frames"))
        .orderBy("video_id", "shot_id")
    },
    Some {
      def h(k: String) = s"CAST(('0x' || substring(md5($k), 1, 15)) AS BIGINT)"
      val vid = "CAST(video_id AS VARCHAR)"
      val fx = "CAST(fidx AS VARCHAR)"
      val sc = "CAST(scene AS VARCHAR)"
      s"""WITH manifest AS ($manifestSql),
        v AS (SELECT video_id,
                LEAST(CAST(FLOOR(total_duration * 24) AS BIGINT), 2390) AS max_f
              FROM manifest WHERE video_id % 50 = 0 AND total_duration > 0),
        f AS (SELECT video_id, UNNEST(generate_series(0, max_f, 10)) AS fidx FROM v),
        sl AS (SELECT video_id, fidx,
                 fidx // (${h(s"'sb:len:' || $vid")} % 80 + 40) AS scene
               FROM f),
        hh AS (SELECT video_id, fidx, scene,
                 ${h(s"'sb:j:' || $vid || ':' || $fx")} AS hf,
                 ${h(s"'sb:f:' || $vid || ':' || $sc")} AS hs
               FROM sl),
        ft AS (SELECT video_id, fidx,
                 (scene % 31 + 1) * 32 + hf % 2 AS d0,
                 ((hs // 32) % 32) * 32 + (hf // 2) % 2 AS d1,
                 ((hs // 1024) % 32) * 32 + (hf // 4) % 2 AS d2,
                 ((hs // 32768) % 32) * 32 + (hf // 8) % 2 AS d3
               FROM hh),
        dd AS (SELECT video_id, fidx,
                 ABS(d0 - LAG(d0) OVER w) + ABS(d1 - LAG(d1) OVER w)
                 + ABS(d2 - LAG(d2) OVER w) + ABS(d3 - LAG(d3) OVER w) AS dist
               FROM ft WINDOW w AS (PARTITION BY video_id ORDER BY fidx)),
        mk AS (SELECT video_id, fidx,
                 CASE WHEN dist IS NULL OR dist >= 16 THEN 1 ELSE 0 END AS boundary
               FROM dd),
        sh AS (SELECT video_id, fidx,
                 SUM(boundary) OVER (PARTITION BY video_id ORDER BY fidx
                   ROWS UNBOUNDED PRECEDING) - 1 AS shot_id
               FROM mk)
        SELECT video_id, CAST(shot_id AS BIGINT) AS shot_id,
          MIN(fidx) AS start_fidx, MAX(fidx) AS end_fidx, COUNT(*) AS n_frames
        FROM sh GROUP BY video_id, shot_id ORDER BY video_id, shot_id"""
    })

  val defs: Seq[QueryDef] = Seq(
    q1Agg, gateMinDuration, tileSegments, filterMinSeglen, projectSummary,
    genSavePathQ, pathBasenameQ, fmtTimeLabelQ, parseRationalQ,
    resolveDurationQ, deriveDurationQ, sampleEveryKQ, sampleLastNQ, bisectSpansQ,
    shotBoundariesQ)
}
