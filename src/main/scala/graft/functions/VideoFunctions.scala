package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions re-expressing the reference's per-record string /
  * math helpers as pure Catalyst expressions (whole-stage-codegen friendly,
  * no UDFs — these all stay inside WholeStageCodegen spans and are pushdown
  * transparent).
  *
  * Reference: HrLi97/dataPipeline_ops (see file:line cites per function).
  * All functions are deterministic and ANSI-safe (guards on divisors, no
  * unguarded string→number casts of dirty data).
  */
object VideoFunctions {

  /** POSIX basename. Ref: common/io/generate_save_path_op.py:26 (os.path.basename).
    * Non-regex (`substring_index`) — this runs once per generated segment
    * path, so at 100 TB it must stay a cheap byte scan, not a regex match. */
  def pathBasename(path: Column): Column = substring_index(path, "/", -1)

  /** Basename without last extension. Ref: common/io/generate_save_path_op.py:27
    * (os.path.splitext) and common/video/scene_segmenter_op.py:114.
    * `locate` on the reversed string finds the last dot without regex;
    * value-identical to `regexp_replace(base, "\\.[^.]*$", "")` (incl. the
    * no-dot, trailing-dot, and dotfile edges — VideoFunctionsSpec). */
  def pathStem(path: Column): Column = {
    val base = pathBasename(path)
    val fromEnd = locate(".", reverse(base))
    when(fromEnd > 0, base.substr(lit(1), length(base) - fromEnd)).otherwise(base)
  }

  /** `HH-MM-SS` label from fractional seconds.
    * Ref: common/video/scene_segmenter_op.py:76-78 (timedelta formatting). */
  def fmtTimeLabel(seconds: Column): Column = {
    val t = floor(seconds).cast("long")
    val h = floor(t / lit(3600)).cast("long")
    val m = floor((t % 3600) / lit(60)).cast("long")
    val s = t % 60
    format_string("%02d-%02d-%02d", h, m, s)
  }

  /** Parse an ffprobe `a/b` rational frame-rate string into a double fps;
    * 0.0 when denominator is missing/zero.
    * Ref: common/video/video_probe_op.py:29-34. */
  def parseRational(rat: Column): Column = {
    val parts = split(rat, "/")
    val num = element_at(parts, 1).cast("double")
    val den = element_at(parts, 2).cast("double")
    when(den.isNotNull && den > 0, num / den).otherwise(lit(0.0))
  }

  /** duration := frame_count / fps, 0.0 when fps <= 0 (cv2-probe derivation).
    * Ref: common/video/video_info_op.py:26-32. */
  def deriveDuration(frameCount: Column, fps: Column): Column =
    when(fps > 0, frameCount.cast("double") / fps).otherwise(lit(0.0))

  /** Cut duration resolution: explicit `duration` wins, else `end - start`.
    * Ref: common/video/ffmpeg_cut_op.py:79-95. */
  def resolveDuration(duration: Column, startTime: Column, endTime: Column): Column =
    coalesce(duration, endTime - startTime)

  /** Deterministic output path `{outDir}/{name}/{name}_seg{idx}_{start}_{dur}.mp4`
    * (start/dur truncated to whole seconds like Python int()).
    * Ref: common/io/generate_save_path_op.py:25-31. */
  def genSavePath(outDir: String, filePath: Column, segIdx: Column,
                  startTime: Column, duration: Column): Column = {
    val name = pathStem(filePath)
    format_string(s"$outDir/%s/%s_seg%d_%d_%d.mp4",
      name, name, segIdx.cast("long"),
      floor(startTime).cast("long"), floor(duration).cast("long"))
  }

  /** Save directory `{outDir}/{name}`. Ref: common/io/generate_save_path_op.py:28. */
  def genSaveDir(outDir: String, filePath: Column): Column =
    format_string(s"$outDir/%s", pathStem(filePath))

  /** Intersection-over-union of two (x1,y1,x2,y2) boxes; 0.0 on empty union.
    * Ref: pipeline/video_extract_frame.py:112-120 (_compute_iou). */
  def iou(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
          bx1: Column, by1: Column, bx2: Column, by2: Column): Column = {
    val iw = greatest(lit(0.0), least(ax2, bx2) - greatest(ax1, bx1))
    val ih = greatest(lit(0.0), least(ay2, by2) - greatest(ay1, by1))
    val inter = iw * ih
    val areaA = greatest(lit(0.0), ax2 - ax1) * greatest(lit(0.0), ay2 - ay1)
    val areaB = greatest(lit(0.0), bx2 - bx1) * greatest(lit(0.0), by2 - by1)
    val union = areaA + areaB - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Area of a box clipped to the image rect [0,w]x[0,h].
    * Ref: pipeline/for_high_bg_all_morelittler.py:162-166. */
  def clippedArea(x1: Column, y1: Column, x2: Column, y2: Column,
                  w: Column, h: Column): Column = {
    val cw = greatest(lit(0.0), least(x2, w.cast("double")) - greatest(x1, lit(0.0)))
    val ch = greatest(lit(0.0), least(y2, h.cast("double")) - greatest(y1, lit(0.0)))
    cw * ch
  }

  /** Normalize an array of float boxes to integer 4-tuples (floor), the
    * relational form of the reference's box coercion.
    * Ref: common/image/person_detect_op.py:35-53. */
  def normalizeBoxes(boxes: Column): Column =
    transform(boxes, b => transform(b, v => floor(v).cast("long")))
}
