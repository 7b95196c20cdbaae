package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-stream processing: windowed aggregation and sessionization.
  *
  * Each transform is written once as DataFrame → DataFrame and works
  * unchanged on a batch read or a `readStream` source — the
  * Structured-Streaming counterpart of the reference's poll-loop ingest
  * (reference: src/raw/raw_layer.py:138-159, which re-runs batch
  * extracts every 5 s instead of using a streaming runtime).
  *
  * Scale: windowed aggregates shuffle on (window, key); watermarks
  * bound state so a 1000-executor streaming job doesn't accumulate
  * unbounded session state.
  */
object EventStreams {

  /** Streaming source over a parquet directory (schema must be known
    * up front for streams).
    */
  def streamFromParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling-window counts and value sums per event type. Decimal-sum
    * keeps results order-independent (double sums are not associative).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"))

  /** Same aggregation with an event-time watermark — required for
    * append-mode streaming output; late events beyond 2 h are dropped.
    */
  def hourlyStatsStreaming(events: DataFrame): DataFrame =
    hourlyStats(events.withWatermark("ts", "2 hours"))

  /** Sessionization: events from one user with gaps < `gap` merge into
    * one session (session_window, batch and streaming).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"),
        col("session_value").cast("double").as("session_value"))

  def sessionizeStreaming(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessionize(events.withWatermark("ts", "2 hours"), gap)

  /** Interval (time-bounded) join: pair each left event with right
    * events of the same user within `[left.ts - before, left.ts]`.
    * Batch: SortMergeJoin on user_id with the range as a post-join
    * condition. Streaming: both sides need watermarks and the range
    * condition bounds the buffered state (stream-stream join).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, before: String): DataFrame =
    intervalJoinTyped(left, right, before, "inner")

  /** Left-outer interval join: every left event survives, unmatched
    * ones with a null right wing — the "did this click convert?"
    * shape. Streaming left-outer emits the null wing only once the
    * watermark passes the join window (eventually-exact); the batch
    * twin is the ground truth the spec compares against.
    */
  def intervalJoinLeftOuter(
      left: DataFrame, right: DataFrame, before: String): DataFrame =
    intervalJoinTyped(left, right, before, "left_outer")

  private def intervalJoinTyped(
      left: DataFrame, right: DataFrame, before: String,
      joinType: String): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
      col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("l_ts"),
      joinType)
      .drop("r_user")
  }

  /** Streaming variant: watermark both sides so the join state is
    * bounded by the interval + watermark delay.
    */
  def intervalJoinStreaming(
      left: DataFrame, right: DataFrame, before: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoin(
      left.withWatermark("ts", watermarkDelay),
      right.withWatermark("ts", watermarkDelay),
      before)

  /** Streaming left-outer: watermarks bound both the buffered state
    * AND decide when an unmatched left row's null wing can be emitted
    * (no right row within the interval can still arrive once the
    * right watermark passes `l_ts`).
    */
  def intervalJoinLeftOuterStreaming(
      left: DataFrame, right: DataFrame, before: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoinLeftOuter(
      left.withWatermark("ts", watermarkDelay),
      right.withWatermark("ts", watermarkDelay),
      before)

  /** Streaming exact dedup: drop events whose `keyCols` were already
    * seen within the watermark horizon — state is bounded by the
    * watermark (keys older than it are evicted), so a 1000-executor
    * job doesn't accumulate unbounded seen-set state. The streaming
    * counterpart of [[graft.operators.Dedup.exact]].
    */
  def dedupStream(events: DataFrame, watermarkDelay: String, keyCols: String*): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
