package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming extension over the `events` table (SURVEY §7 step 7:
  * the reference is batch-only, so this is the declared growth path, not a
  * port). One transform definition serves BOTH batch and streaming frames —
  * the unified Dataset API guarantee — so correctness is oracle-checked in
  * batch mode and the streaming path is spec-tested with availableNow.
  *
  * Scale: tumbling-window counts shuffle on (window, event_type); with a
  * watermark, state per key is bounded and dropped `delay` past the window
  * end — the standard unbounded-stream design.
  */
object EventStream {

  /** events with a proper event-time column. `ts` arrives as a
    * nanosecond-epoch long (nanosAsLong parquet flag); truncate to µs with
    * integer division — double division has ~256 ns ulp at 1.7e18 and can
    * flip a window assignment at exact boundaries. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window per-type aggregation; identical semantics in batch
    * and streaming. Money-sums accumulate in exact decimal (order-independent)
    * and surface as double — decimal→double is correctly rounded in both
    * Spark and DuckDB at these magnitudes, so the bits match the oracle. */
  def tumblingTypeCounts(df: DataFrame, windowSec: Int): DataFrame =
    withEventTime(df)
      .groupBy(window(col("event_time"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming source over a parquet directory of events files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Streaming variant with watermarked state expiry. */
  def streamingTumblingTypeCounts(stream: DataFrame, windowSec: Int,
                                  watermarkDelay: String = "10 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("window_start_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch form of key dedup: distinct business keys. */
  def dedupKeys(df: DataFrame): DataFrame =
    df.select("user_id", "event_type").distinct()

  /** Streaming exact-dedup on business keys with BOUNDED state:
    * `dropDuplicatesWithinWatermark` evicts seen-key state once the
    * watermark passes it, so an unbounded event stream doesn't grow state
    * forever (plain `dropDuplicates` on a stream would). Emits each
    * (user_id, event_type) once — the streaming twin of [[dedupKeys]],
    * equal on bounded input when nothing arrives later than the delay
    * (StreamingSinksSpec). */
  def streamingDedupKeys(stream: DataFrame,
                         watermarkDelay: String = "10 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")

  /** Sessionization by inactivity gap — the other canonical streaming agg;
    * expressed with a window-function gap-and-island in batch (oracle-able)
    * and usable as-is on bounded streams via foreachBatch. */
  def sessionize(df: DataFrame, gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_time")
    val marked = withEventTime(df)
      .withColumn("prev_t", lag(col("event_time").cast("long"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_t").isNull ||
          col("event_time").cast("long") - col("prev_t") > gapSec, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_time").cast("long")).as("session_start_epoch"),
        max(col("event_time").cast("long")).as("session_end_epoch"))
  }
}
