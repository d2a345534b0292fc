package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.money._

/** Event-time analytics over the events stream — the Structured
  * Streaming surface beyond CDC: tumbling-window aggregation with
  * watermarked late-data handling. The same function body serves batch
  * frames (tests, backfills) and streaming frames (readStream /
  * MemoryStream) — one definition, two execution modes, which is the
  * Spark-native analog of a continuously-maintained rollup.
  */
object EventAnalytics {

  /** events.ts is nanos-since-epoch (see TestData.events); Spark
    * windows want a timestamp. NOT a plain `/ 1000`: Column `/` is
    * DOUBLE division, and a 1.7e18 nanos long already exceeds 2^53 —
    * the long→double CONVERSION itself is lossy, so the quotient can
    * land ±1 µs off. Invisible under hour-truncating windows, fatal to
    * raw session bounds (q41 caught it at sf0.1). Decimal division is
    * exact; the long cast truncates toward zero = floor for epoch
    * nanos. */
  def eventTime(tsNanos: Column): Column =
    timestamp_micros(
      (tsNanos.cast("decimal(20,0)") / lit(1000)).cast("long"))

  /** Tumbling-window stats per event type. For a streaming input, pass
    * `watermark` (e.g. "10 minutes") to bound state and admit
    * bounded-late events; append-mode output finalizes a window once
    * the watermark passes it. */
  def windowedStats(events: DataFrame, windowLength: String,
                    watermark: Option[String] = None): DataFrame = {
    val timed = events.withColumn("event_time", eventTime(col("ts")))
    val marked = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    marked
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
           sumMoney(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("event_count"), col("total_value"))
  }

  /** Sliding-window stats per event type: like [[windowedStats]] but
    * each event contributes to `windowLength / slide` overlapping
    * windows (epoch-aligned, Spark's `window(col, len, slide)`), the
    * standard rolling-rate shape. Same body for batch and streaming. */
  def slidingStats(events: DataFrame, windowLength: String, slide: String,
                   watermark: Option[String] = None): DataFrame = {
    val timed = events.withColumn("event_time", eventTime(col("ts")))
    val marked = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    marked
      .groupBy(window(col("event_time"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
           sumMoney(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("event_count"), col("total_value"))
  }

  /** Native session windows: Spark's `session_window` merges a user's
    * events separated by less than `gap` — the streaming-native
    * sessionization (state-store-backed, windows close when the
    * watermark passes; pass `watermark` for streaming inputs). Same
    * sessions as [[sessionize]]'s analytic-window formulation, but
    * this shape runs under `readStream` unchanged. */
  def sessionWindowStats(events: DataFrame, gap: String,
                         watermark: Option[String] = None): DataFrame = {
    val timed = events.withColumn("event_time", eventTime(col("ts")))
    val marked = watermark.fold(timed)(w => timed.withWatermark("event_time", w))
    marked
      .groupBy(session_window(col("event_time"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sumMoney(col("value")).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
              col("sw.end").as("session_end"), col("n_events"),
              col("session_value"))
  }

  /** Gap-based sessionization: a new session starts when a user is
    * idle longer than `gap`. Classic lag + cumulative-sum formulation —
    * two analytic windows over one (user, time) sort; the shuffle
    * partitions by user, so it scales with user cardinality. Returns
    * one row per session with bounds and aggregates.
    */
  def sessionize(events: DataFrame, gapNanos: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(
        col("__prev").isNull || col("ts") - col("__prev") > gapNanos, 1
      ).otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           sumMoney(col("value")).as("session_value"))
  }
}
