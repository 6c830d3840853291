package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins and streaming dedup — the Structured Streaming
  * operators a continuous ingest pipeline needs around the windowed
  * aggregations in [[EventWindows]] (SURVEY.md §2.8 surface; the J5
  * dedup gate's streaming twin lives here as [[dedupStream]]).
  *
  * Scale notes (100 TB/day): both operators keep per-key state in the
  * state store, sharded with the shuffle across executors; the
  * watermarks are what BOUND that state — the join buffers only rows
  * younger than the time-range condition allows, and the dedup buffer
  * drops ids once the watermark passes them. Without the watermark
  * either operator's state grows without bound — both therefore demand
  * one from the caller.
  */
object StreamOps {

  /** Stream-stream interval join (attribution shape): each left event
    * pairs with right events of the same key whose timestamp lies in
    * [leftTs - lookback, leftTs]. Both inputs need a `tstamp` column and
    * get watermarked here; Spark derives the state retention for each
    * side from the watermarks plus the interval condition.
    *
    * Inner by default; "leftOuter" emits unmatched left rows once their
    * watermark expires (exactly the reference's left-join enrich
    * semantics, J1, made continuous).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lookback: String = "1 hour",
                   watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("tstamp", watermark).alias("l")
    val r = right.withWatermark("tstamp", watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.tstamp") >= col("l.tstamp") - expr(s"INTERVAL $lookback") &&
        col("r.tstamp") <= col("l.tstamp"),
      joinType)
  }

  /** Streaming exact-dedup gate: drop rows whose `idCols` were already
    * seen within the watermark horizon (dropDuplicatesWithinWatermark —
    * state for an id is freed once the watermark passes it, unlike plain
    * dropDuplicates whose state never ages out). Needs `tstamp`.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("tstamp", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
}
