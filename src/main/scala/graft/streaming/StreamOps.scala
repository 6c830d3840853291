package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.{DataFrame, Dataset}

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

  /** One key's running top-k snapshot (Update-mode emission). */
  case class TopKSnapshot(key_id: Long, n_seen: Long,
                          top_scores: Seq[Double], top_ids: Seq[Long])

  /** Streaming per-key top-k (leaderboard): the continuous twin of the
    * batch `TopKPerKey` operator. State per key is EXACTLY the k best
    * (score desc, id asc) entries seen so far — bounded by construction,
    * no watermark needed for state size (pair with one if the KEYSPACE
    * is unbounded). Each micro-batch emits a refreshed snapshot for the
    * keys it touched (`n_seen` is the per-key high-water mark, so the
    * row with the largest `n_seen` is the current standing).
    *
    * Input needs (`key_id`, `entry_id`, `score`). Batch-parity law:
    * after any prefix of the stream, a key's latest snapshot equals
    * `Relational.topKPerKey` over the same rows (pinned in
    * `StreamingSpec`).
    */
  def topKStream(events: DataFrame, k: Int): Dataset[TopKSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key_id").cast("long"), col("entry_id").cast("long"),
        col("score").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, List[(Double, Long)]), TopKSnapshot](
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Double)],
         state: GroupState[(Long, List[(Double, Long)])]) =>
          var (n, top) = state.getOption.getOrElse((0L, List.empty[(Double, Long)]))
          it.foreach { case (_, id, score) =>
            n += 1
            top = ((score, id) :: top)
              .sortBy { case (s, i) => (-s, i) }.take(k)
          }
          state.update((n, top))
          TopKSnapshot(key, n, top.map(_._1), top.map(_._2))
      }
  }
}
