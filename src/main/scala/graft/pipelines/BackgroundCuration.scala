package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VideoFunctions
import graft.ml.{ExecutorSingleton, Models}
import graft.sources.Sinks

/** E4 — `for_high_bg_all_morelittler` recomposed Spark-first
  * (ref: pipeline/for_high_bg_all_morelittler.py:101-245): the image-only
  * curation cousin of E3. JSONL records → resolution gate (F3) →
  * person-count gate 1–3 (F4) → largest-clipped-box-area gate ≤ 40% (F5)
  * → per-person mask/matte stubs → enriched records + binary sink.
  *
  * The cheap relational gates run BEFORE the opaque model stage by
  * construction (the reference hand-tunes this ordering; here Catalyst
  * additionally prunes columns into the parquet/json scan). The matting
  * model is a deterministic stub behind the ObjectStore/model seams.
  */
class BackgroundCuration(person: () => Models.PersonDetector,
                         store: Sinks.ObjectStore,
                         minH: Int = 1000, minW: Int = 1000,
                         maxPersons: Int = 3, maxAreaRatio: Double = 0.4)
  extends Serializable {

  /** Relational gates (F3/F4/F5) over records carrying image metadata +
    * detected person boxes as array<struct<x1,y1,x2,y2>>. */
  def gates(df: DataFrame): DataFrame = {
    val clipped = transform(col("person_boxes"), b =>
      VideoFunctions.clippedArea(
        b.getField("x1").cast("double"), b.getField("y1").cast("double"),
        b.getField("x2").cast("double"), b.getField("y2").cast("double"),
        col("w"), col("h")))
    df.filter(col("h") >= minH && col("w") >= minW)
      .filter(size(col("person_boxes")).between(1, maxPersons))
      .withColumn("max_area", array_max(clipped))
      .withColumn("area_ratio", col("max_area") / (col("h") * col("w")).cast("double"))
      .filter(col("area_ratio") <= maxAreaRatio)
  }

  /** Detection stage: attach person boxes via the executor-singleton
    * detector (keyed by image id — fakes need no pixels). */
  def detect(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pf = person
    df.select(col("image_id").cast("long"), col("image_path").cast("string"),
        col("h").cast("long"), col("w").cast("long"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        val det = ExecutorSingleton.getOrCreate("graft.person_detector")(pf())
        it.map { case (id, path, h, w) =>
          val boxes = det.detect(id, 0L).map(b => (b.x1, b.y1, b.x2, b.y2))
          (id, path, h, w, boxes)
        }
      }
      .toDF("image_id", "image_path", "h", "w", "person_boxes_raw")
      .withColumn("person_boxes", transform(col("person_boxes_raw"), t =>
        struct(t.getField("_1").as("x1"), t.getField("_2").as("y1"),
          t.getField("_3").as("x2"), t.getField("_4").as("y2"))))
      .drop("person_boxes_raw")
  }

  /** Mask/matte stub per surviving person box: deterministic pseudo-mask
    * bytes written through the object store (a real deployment swaps in
    * SAM2/BEN2 behind the same seam — ref common/image/grounding_mask_op.py,
    * common/transform/bg_rm_op.py). Emits per-object status rows. */
  def maskAndSink(df: DataFrame): DataFrame = {
    val keyed = df.select(col("image_id"), posexplode(col("person_boxes")).as(Seq("pos", "box")))
      .select(col("image_id"), (col("pos") + 1).as("box_idx"),
        format_string("masks/img_%d_box_%d.png", col("image_id"), col("pos") + 1).as("key"),
        // STUB mask payload: box coords as bytes (real impl: encoded mask PNG)
        encode(to_json(col("box")), "UTF-8").as("bytes"))
    Sinks.writeBinary(keyed, "key", "bytes", store)
  }

  /** Full E4: records → detect → gates → mask+sink status. Returns the
    * enriched surviving records; sink statuses via [[maskAndSink]]. */
  def run(records: DataFrame): DataFrame =
    gates(detect(records))
}
