package graft.queries

import org.apache.spark.sql.functions._

import graft.ml.Models
import graft.pipelines.{Captioning, FrameMining, VideoSlicing}

/** End-to-end pipeline recompositions (E1–E3) as registered queries. The
  * deterministic fakes make E1/E2 fully oracle-replayable; E3 contains the
  * order-dependent dedup fold → rows-only. */
object PipelineQueries {
  import Tables.{table, manifestSql}

  /** E1 `cut_ruidi` shape: known-duration manifest → gate → tile →
    * retried cut → per-file summary (dead-letter rows kept). */
  val pipelineE1 = QueryDef("pipeline_e1_summary",
    (s, dir) => {
      val manifest = Tables.manifest(s, dir)
      new VideoSlicing(() => new Models.FakeVideoTool, segDur = 300.0, minDur = 60.0)
        .runWithKnownDurations(manifest)
        .orderBy("video_id")
    },
    Some(s"""WITH manifest AS ($manifestSql),
      segs AS (
        SELECT video_id,
          LEAST(total_duration, seg0 * 300.0 + 300.0) - seg0 * 300.0 AS seg_len
        FROM (SELECT video_id, total_duration,
                UNNEST(generate_series(0, CAST(CEIL(total_duration / 300.0) AS BIGINT) - 1)) AS seg0
              FROM manifest WHERE total_duration > 0 AND total_duration >= 60)),
      counts AS (
        SELECT video_id, COUNT(*) AS segments_count, COUNT(*) AS cuts_ok
        FROM segs WHERE seg_len >= 60.0 GROUP BY video_id)
      SELECT m.video_id, m.file_path,
        CASE WHEN m.total_duration <= 0 OR m.total_duration < 60 THEN 0 ELSE 1 END AS status,
        CASE WHEN m.total_duration <= 0 OR m.total_duration < 60 THEN 'duration too short' END AS reason,
        COALESCE(c.segments_count, 0) AS segments_count,
        COALESCE(c.cuts_ok, 0) AS cuts_ok
      FROM manifest m LEFT JOIN counts c USING (video_id)
      ORDER BY m.video_id"""))

  /** E2 captioning: placeholder parse (list + bare-path fallback) → fixed
    * prompt → executor-singleton "VLM" → training-record JSON. */
  val pipelineCaption = QueryDef("pipeline_caption",
    (s, dir) => {
      val input = table(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0,
          format_string("[\"/imgs/a_%d.jpg\",\"/imgs/b_%d.jpg\"]", col("doc_id"), col("doc_id")))
          .otherwise(format_string("/imgs/a_%d.jpg", col("doc_id"))).as("input_images"),
        format_string("/out/img_%d.png", col("doc_id")).as("output_image"))
      new Captioning(() => new Models.FakeCaptioner).run(input)
        .select("doc_id", "caption", "record")
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0
               THEN [printf('/imgs/a_%d.jpg', doc_id), printf('/imgs/b_%d.jpg', doc_id)]
               ELSE [printf('/imgs/a_%d.jpg', doc_id)] END AS imgs,
          printf('/out/img_%d.png', doc_id) AS output_image
        FROM documents),
      p AS (
        SELECT doc_id, imgs, output_image,
          '<|system|>You are a captioner.<|user|>' || repeat('<image>', len(imgs))
            || ' Describe the subject.' AS prompt
        FROM t),
      c AS (
        SELECT doc_id, imgs, output_image,
          substring(md5(prompt || '|' || array_to_string(imgs, ',')), 1, 16) AS caption
        FROM p)
      SELECT doc_id, caption,
        CAST(to_json(struct_pack(task_type := 'subject_driven', instruction := caption,
          input_images := imgs, output_image := output_image)) AS VARCHAR) AS record
      FROM c ORDER BY doc_id"""))

  /** E3 two-phase frame mining (greedy fold inside → rows-only). */
  val pipelineFrameMining = QueryDef("pipeline_frame_mining",
    (s, dir) => {
      val manifest = Tables.manifest(s, dir)
        .filter(col("video_id") % 100 === 0)
        .withColumn("total_frames", floor(col("total_duration") * 24).cast("long"))
        .select("video_id", "total_frames")
      new FrameMining(
        () => new Models.FakePersonDetector, () => new Models.FakeFaceDetector,
        () => new Models.FakeFaceQualityScorer, () => new Models.FakeFaceEmbedder())
        .run(manifest)
    },
    None)

  /** E4 image curation (fake detector boxes → rows-only). */
  val pipelineBgCuration = QueryDef("pipeline_bg_curation",
    (s, dir) => {
      val images = table(s, dir, "part").select(
        col("p_partkey").as("image_id"),
        format_string("/imgs/part_%d.jpg", col("p_partkey")).as("image_path"),
        (lit(400L) + (col("p_partkey") * 37) % 1200).as("h"),
        (lit(600L) + (col("p_partkey") * 53) % 1600).as("w"))
      new graft.pipelines.BackgroundCuration(
        () => new Models.FakePersonDetector,
        new graft.sources.Sinks.LocalFsStore("/tmp/graft_bg_out"))
        .run(images)
        .select("image_id", "h", "w", "max_area", "area_ratio")
        .orderBy("image_id")
    },
    None)

  val defs: Seq[QueryDef] = Seq(pipelineE1, pipelineCaption, pipelineFrameMining, pipelineBgCuration)
}
