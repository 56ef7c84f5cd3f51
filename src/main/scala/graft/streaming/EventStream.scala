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

  /** Open-session state for [[streamingSessionize]]: three longs per
    * active user. */
  case class Open(start: Long, last: Long, n: Long)

  /** events with a proper event-time column, whatever physical shape `ts`
    * arrived in (the testdata has carried both nanosecond-epoch longs and
    * µs timestamps across generations). For the long form, truncate to µs
    * with integer division — double division has ~256 ns ulp at 1.7e18 and
    * can flip a window assignment at exact boundaries; for the naive-
    * timestamp form, the instant cast runs under the session timezone
    * (UTC everywhere in this engine — GraftSession/Tables pin it). */
  def withEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("event_time", col("ts").cast(TimestampType))
      case Some(TimestampType) =>
        df.withColumn("event_time", col("ts"))
      case _ =>
        df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    }
  }

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

  /** Streaming source over a parquet directory of events files. File
    * streams need an explicit schema; infer it from the files present so
    * the source tracks whichever physical `ts` type the data carries
    * (ns-long vs µs-timestamp — [[withEventTime]] handles either). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
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

  /** Stream-stream attribution join: each click matched to the SAME
    * user's views in the preceding `windowSec` seconds. Watermarks on
    * BOTH sides plus the event-time range condition let Spark bound the
    * join state: a buffered view is dropped once the click-side watermark
    * passes `view_time + windowSec`, so an unbounded stream pair joins in
    * bounded memory — the canonical streaming join shape. Batch twin:
    * the `stream_interval_join` query (same pairs via integer-µs
    * arithmetic, DuckDB-oracled); StreamingSinksSpec proves stream ==
    * batch across multiple microbatches. */
  def streamingAttributionJoin(stream: DataFrame, windowSec: Long,
                               watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = withEventTime(stream.filter(col("event_type") === "click"))
      .select(col("user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", watermarkDelay)
    val v = withEventTime(stream.filter(col("event_type") === "view"))
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", watermarkDelay)
    c.join(v, col("user_id") === col("view_user") &&
        col("view_time") >= col("click_time") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("view_time") <= col("click_time"))
      .select("user_id", "click_id", "view_id")
  }

  /** Batch form of key dedup: distinct business keys. */
  def dedupKeys(df: DataFrame): DataFrame =
    df.select("user_id", "event_type").distinct()

  /** Stream-static dimension enrichment — the canonical streaming join
    * shape Structured Streaming keeps STATELESS: each micro-batch joins
    * the broadcast static dimension, no watermark or join state needed
    * (unlike stream-stream). Unmatched events keep flowing with segment
    * 'unknown' (left join — an enrichment must never drop facts because
    * the dim is stale). Works identically on a batch frame, which is how
    * the registered `stream_enrich` query oracles it; StreamingSinksSpec
    * proves stream == batch over the same files. At 100 TB the dim
    * either broadcasts (typical: dims are small) or falls back to a
    * shuffle join — the broadcast hint here states the intent, AQE
    * drops it if the dim exceeds the threshold. */
  def enrich(events: DataFrame, dims: DataFrame): DataFrame =
    events.join(broadcast(dims), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))

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

  /** Streaming sessionization with CUSTOM state — the
    * `flatMapGroupsWithState` path for semantics windowed aggs can't
    * express: per-user open-session state (start, last-seen, count) that
    * extends on every in-gap event and emits exactly when the event-time
    * watermark passes `last + gap` (EventTimeTimeout). State per key is
    * three longs — bounded regardless of stream length — and eviction is
    * watermark-driven, so a 100 TB/day event stream holds state only for
    * users active inside the watermark horizon.
    *
    * Emits the same (user_id, n_events, session_start_epoch,
    * session_end_epoch) rows as the batch [[sessionize]] once all input is
    * ingested and the watermark has flushed (StreamingSinksSpec proves
    * stream == batch on the testdata, modulo session_idx which is a batch
    * window-numbering artifact). Events must arrive in-order per user
    * within the gap for identical splits — guaranteed under availableNow
    * replay of time-ordered files; out-of-order events inside the
    * watermark merge into the open session like the batch form. */
  def streamingSessionize(stream: DataFrame, gapSec: Long,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // The watermark must ride the (untouched) timestamp column into the
    // stateful operator — casting it away would drop the watermark tag.
    val typed = withEventTime(stream)
      .withWatermark("event_time", watermarkDelay)
      .select(col("user_id"), col("event_time"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Open, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rawEvents: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Open]) =>
          val events = rawEvents.map { case (u, ts) => (u, ts.getTime / 1000L) }
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single((user, s.n, s.start, s.last))
          } else {
            val sorted = events.map(_._2).toArray.sorted
            var closed = List.empty[(Long, Long, Long, Long)]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSec =>
                  cur = Some(Open(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= ((user, s.n, s.start, s.last))
                  cur = Some(Open(t, t, 1L))
                case None =>
                  cur = Some(Open(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session when the watermark passes last + gap
              state.setTimeoutTimestamp((s.last + gapSec) * 1000L + 1L)
            }
            closed.reverseIterator
          }
      }
      .toDF("user_id", "n_events", "session_start_epoch", "session_end_epoch")
  }

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
