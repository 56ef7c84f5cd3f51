package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.ml.{ExecutorSingleton, Models}

/** E2 — `caption` recomposed Spark-first (ref: pipeline/caption.py:58-88):
  * (input_images, output_image) rows → placeholder parse (stringified list
  * OR bare path, ref common/image/placeholders_op.py:19-29) → fixed prompt
  * assembly → per-executor VLM generate → 4-field training record JSONL.
  *
  * Prompt/record assembly is pure Catalyst; only `generate` is a partition
  * map with the model held as an executor singleton (Ray-actor analog).
  */
class Captioning(captionerFactory: () => Models.Captioner) extends Serializable {

  val systemPrompt = "<|system|>You are a captioner.<|user|>"
  val question = " Describe the subject."

  /** Parse `input_images`: JSON-ish list or single bare path. */
  def parsePlaceholders(df: DataFrame): DataFrame =
    df.withColumn("images",
      when(col("input_images").startsWith("["),
        from_json(col("input_images"), ArrayType(StringType)))
        .otherwise(array(col("input_images"))))

  /** Fixed chat prompt: system + one <image> placeholder per ref + question.
    * Ref: common/transform/vision_inputs_op.py:25-31, pipeline/caption.py:67-75. */
  def assemblePrompt(df: DataFrame): DataFrame =
    df.withColumn("prompt", concat(
      lit(systemPrompt),
      expr("repeat('<image>', size(images))"),
      lit(question)))

  /** Generate stage (executor-singleton model). */
  def generate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val factory = captionerFactory
    df.select(col("doc_id").cast("long"), col("prompt"), col("images"),
        col("output_image").cast("string"))
      .as[(Long, String, Seq[String], String)]
      .mapPartitions { it =>
        val model = ExecutorSingleton.getOrCreate("graft.captioner")(factory())
        it.map { case (id, prompt, images, out) =>
          (id, prompt, images, out, model.caption(prompt, images))
        }
      }
      .toDF("doc_id", "prompt", "images", "output_image", "caption")
  }

  /** 4-field training record (ref: common/io/save_output_op.py:18-23). */
  def projectRecord(df: DataFrame): DataFrame =
    df.withColumn("record", to_json(struct(
      lit("subject_driven").as("task_type"),
      col("caption").as("instruction"),
      col("images").as("input_images"),
      col("output_image").as("output_image"))))

  def run(df: DataFrame): DataFrame =
    projectRecord(generate(assemblePrompt(parsePlaceholders(df))))
}
