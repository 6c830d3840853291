package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-time aggregation surface (SURVEY.md §2.8).
  *
  * The reference is batch-only, but its drop-directory loop is a file
  * stream; the engine exposes the full Structured Streaming surface over
  * it: watermarks, tumbling/sliding windows, session windows. The window
  * specs here are the streaming twins of queries q25–q27 — identical
  * expressions, so the batch oracle results certify the streaming logic.
  *
  * Scale notes: windowed aggregation state is partitioned by (window,
  * keys) — at 1000 executors the state store shards with the shuffle;
  * the watermark bounds state size (late data beyond it is dropped).
  */
object EventWindows {

  /** Tumbling count/sum per (window, event_type) with a watermark.
    * Input must carry `tstamp: Timestamp`, `event_type`, `value`.
    */
  def tumbling(events: DataFrame, size: String = "5 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tstamp", watermark)
      .groupBy(window(col("tstamp"), size), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding windows (size/slide) with a watermark. */
  def sliding(events: DataFrame, size: String = "10 minutes",
              slide: String = "5 minutes",
              watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tstamp", watermark)
      .groupBy(window(col("tstamp"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows (gap-based) per user — Spark's native
    * session_window; state closes once the watermark passes the gap.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("tstamp", watermark)
      .groupBy(session_window(col("tstamp"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"), col("sum_value"))
}
