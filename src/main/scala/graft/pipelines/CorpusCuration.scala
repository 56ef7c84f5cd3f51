package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Packing}

/** End-to-end text-corpus curation — the composed pipeline a training-data
  * user actually runs, assembled from the engine's text operators:
  *
  *   raw docs → PII scrub → quality / language / repetition gates →
  *   exact dedup (bag-of-words, keep min id) → test-set n-gram
  *   decontamination → weighted domain-mix sampling → salted
  *   train/val/test split → context-window chunking → greedy sequence
  *   packing.
  *
  * Every stage before packing is pure Catalyst (scrub/gates/split/chunk
  * ride the scan; dedup is one hash aggregate window; decontamination is
  * a broadcast gram join + anti-join; mix sampling is a ~20-row broadcast
  * threshold), and it is oracle-checked END-TO-END as one composed
  * DuckDB CTE chain (`pipeline_curation`). Packing is the one
  * order-dependent fold (rows-only, PackingSpec properties).
  *
  * Near-dup dedup at corpus scale plugs in between dedup and
  * decontamination: MinHash-LSH pairs → [[graft.operators.Components]]
  * clusters → keep min-id per cluster (each piece oracle/spec-checked on
  * its own; wiring them here is one join, `dedupNearDupsKeep`).
  */
class CorpusCuration(minQuality: Double = 0.3, maxRepetition: Double = 0.6,
                     allowLangs: Seq[String] = Seq("en"),
                     chunkTokens: Int = 32, packBudget: Long = 256L,
                     salt: String = "graft-v1", mixSalt: String = "graft-sample",
                     deconNgram: Int = 5) extends Serializable {

  /** PII scrub onto `clean` + ONE tokenization into `toks` — every
    * downstream stage (all three gate metrics, the dedup key, chunking)
    * derives from the materialized token column instead of re-splitting
    * the text per metric (tokenization dominated the gate cost ~4×). */
  def scrub(docs: DataFrame): DataFrame =
    graft.ops.Parallelism.ensure(docs)
      .withColumn("clean", piiScrub(col("text")))
      .withColumn("toks", tokens(col("clean")))

  /** Quality / language / repetition gates (drop, not dead-letter: a
    * curation pass filters — lineage tracking would keep a reject sink). */
  def gates(scrubbed: DataFrame): DataFrame =
    scrubbed
      .withColumn("quality", qualityScoreTokens(col("clean"), col("toks")))
      .withColumn("lang_pred", langIdHeuristicTokens(col("toks")))
      .withColumn("rep_ratio", repetitionRatioTokens(col("toks")))
      .filter(col("quality") >= minQuality &&
        col("rep_ratio") <= maxRepetition &&
        col("lang_pred").isin(allowLangs: _*))

  /** Exact dedup: keep the min doc_id per bag-of-words key. A window-min
    * over the key — NOT the agg+self-join form, which executes the whole
    * upstream (scrub+gates) twice; the window is one shuffle keyed by
    * content hash with the upstream evaluated once. */
  def dedupExactKeep(gated: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(array_join(array_sort(array_distinct(col("toks"))), " "))
    gated
      .withColumn("_keep", min(col("doc_id")).over(Window.partitionBy(key)))
      .filter(col("doc_id") === col("_keep"))
      .drop("_keep")
  }

  /** Optional near-dup pass: given (id_a, id_b) near-dup pairs from any
    * blocker (MinHash-LSH / SimHash / dHash), cluster them and keep the
    * min-id doc per cluster. */
  def dedupNearDupsKeep(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = graft.operators.Components.connectedComponents(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    docs.join(comps.filter(col("id") === col("comp")).select(col("id").as("doc_id")),
      Seq("doc_id"))
  }

  /** Test-set n-gram decontamination: drop any non-test document sharing
    * a word `deconNgram`-gram with a document destined for the test split
    * (bucket ≥ 90 under the same salt the split stage will use). In
    * production the held-out side is a few-MB benchmark suite and the
    * gram join broadcasts; HERE the test side is the salted 10% split —
    * corpus-proportional — so the join strategy is left to Catalyst/AQE:
    * it broadcasts while the gram set fits and degrades to a shuffle
    * hash join beyond that, instead of aborting at the broadcast limit.
    * localCheckpoint once: the gram join reads the deduped corpus on
    * three branches (test grams, candidate grams, the kept rows); without
    * a materialization the scrub→gate→dedup subtree would execute 3×. */
  def decontaminate(deduped: DataFrame): DataFrame = {
    val base = deduped.localCheckpoint()
    val grams = base.select(col("doc_id"),
      splitBucket(col("doc_id"), salt).as("_bucket"),
      explode(wordShingles(col("clean"), deconNgram)).as("gram"))
    val testGrams = grams.filter(col("_bucket") >= 90).select("gram").distinct()
    val contaminated = grams.filter(col("_bucket") < 90)
      .join(testGrams, "gram")
      .select("doc_id").distinct()
    base.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Weighted domain-mix sampling: downsample every source to the
    * smallest source's share with a salted integer-hash threshold —
    * deterministic across reruns and engines. One map-side-partial count
    * aggregate over ~|sources| rows, then a broadcast join + narrow
    * filter; the corpus is scanned once. */
  def sampleWeighted(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy("source").agg(count(lit(1)).as("_cnt"))
      .withColumn("_target", min(col("_cnt")).over(Window.partitionBy()))
    docs.join(broadcast(counts), "source")
      .filter(hashBucket(col("doc_id"), mixSalt, 10000) * col("_cnt") <
        col("_target") * lit(10000L))
      .drop("_cnt", "_target")
  }

  /** Salted split + fixed-window chunking (the oracle-checked tail);
    * reuses the `toks` column from [[scrub]]. */
  def splitAndChunk(deduped: DataFrame): DataFrame =
    deduped
      .withColumn("split", splitAssign(col("doc_id"), salt, 80, 10))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"(n_tok + ${chunkTokens - 1}) div $chunkTokens - 1"))))
      .select(col("doc_id"), col("source"), col("split"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"),
          (col("chunk_idx") * chunkTokens + 1).cast("int"), lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens.toLong), col("n_tok") - col("chunk_idx") * chunkTokens)
          .as("chunk_tokens"))

  /** Declarative prefix: everything except packing. The decontaminated
    * frame is checkpointed before mix-sampling: sampleWeighted reads its
    * input twice (per-source counts + the kept branch), and without the
    * materialization the corpus-wide gram join + anti-join would execute
    * twice per run. */
  def curate(docs: DataFrame): DataFrame =
    splitAndChunk(sampleWeighted(
      decontaminate(dedupExactKeep(gates(scrub(docs)))).localCheckpoint()))

  /** Full run: curate, then pack chunks into `packBudget`-token bins per
    * (split, source) shard — the training-sequence layout. */
  def runPacked(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = curate(docs)
    val items = chunks.select(
        concat_ws("/", col("split"), col("source")).as("group"),
        // chunk ids must be unique per group: doc_id * 2^20 + chunk_idx.
        // 2^20 chunks = 33M tokens/doc at 32-token windows; fail loudly
        // rather than silently collide if a future corpus exceeds it.
        when(col("chunk_idx") < 1048576L,
            col("doc_id") * 1048576L + col("chunk_idx"))
          .otherwise(raise_error(format_string(
            "doc %d has chunk_idx %d >= 2^20; widen the chunk-key encoding",
            col("doc_id"), col("chunk_idx")))).as("doc_id"),
        col("chunk_tokens").as("n_tokens"))
      .as[Packing.Item]
    Packing.run(items, packBudget)(spark).toDF()
      .withColumnRenamed("doc_id", "chunk_key")
  }
}
