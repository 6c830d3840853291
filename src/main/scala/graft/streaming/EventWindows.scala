package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.{c_round => round}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

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

  /** One user's open session (the flatMapGroupsWithState buffer). */
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)

  /** A closed session. */
  case class SessionOut(user_id: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long, sum_value: Double)

  /** Gap-based sessionization via CUSTOM state
    * (`flatMapGroupsWithState`) — the extension point for session logic
    * `session_window` can't express (per-session caps, custom close
    * conditions, enriched outputs). Semantics here mirror [[sessions]]:
    * a session closes when a same-user event arrives more than `gapMs`
    * later (emitted immediately) or when the event-time watermark passes
    * last-event + gap (emitted on timeout).
    *
    * Input needs (`user_id`, `tstamp`, `value`) and the watermark set
    * HERE (EventTimeTimeout requires one). State is per-user and
    * partitioned with the shuffle — at 1000 executors the state store
    * shards by key; the watermark bounds retained state.
    */
  def statefulSessions(events: DataFrame, gapMs: Long,
                       watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.withWatermark("tstamp", watermark)
      .select(col("user_id").cast("long"), col("tstamp"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          def out(s: SessionState) =
            SessionOut(user, s.startMs, s.lastMs, s.n, s.sum)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(out(s))
          } else {
            val evs = it.map(e => (e._2.getTime, e._3)).toArray.sortBy(_._1)
            val closed = ArrayBuffer[SessionOut]()
            var cur = state.getOption
            evs.foreach { case (ms, v) =>
              cur match {
                case Some(s) if ms - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.lastMs, ms),
                    s.n + 1, s.sum + v))
                case Some(s) =>
                  closed += out(s)
                  cur = Some(SessionState(ms, ms, 1, v))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, v))
              }
            }
            cur match {
              case Some(s) =>
                val closeAt = s.lastMs + gapMs
                if (state.getCurrentWatermarkMs() >= closeAt) {
                  // the watermark already passed this session's gap
                  state.remove()
                  closed += out(s)
                } else {
                  state.update(s)
                  state.setTimeoutTimestamp(closeAt)
                }
              case None =>
            }
            closed.iterator
          }
      }
  }
}
