package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed BYTE-LEVEL BPE training — the GPT-2 recipe end to
  * end: q408's bytes→unicode bijection makes the alphabet exactly
  * 256 symbols, pretokens decompose into their mapped characters,
  * and each round merges the MOST FREQUENT adjacent pair (raw
  * counts, the Sennrich rule — deliberately the OTHER argmax from
  * WordPiece's likelihood score, ties lexicographic on (left,
  * right)). Encoding applies the learned merges IN TRAINING ORDER
  * (BPE's rank rule, not longest-match) — and because the alphabet
  * covers every byte, encoding is TOTAL: no [UNK], ever, and
  * concatenating the pieces always reproduces the input exactly.
  *
  * Scale (100 TB): the state is the DISTINCT-pretoken table with
  * counts (corpus-size-independent); each round is one partial
  * aggregation (pair counts) and a TakeOrdered(1) argmax — ONE row
  * to the driver per round, the adjudicated bounded-collect
  * contract; the winning pair rides the rewrite as a literal. The
  * per-round state is trackedCheckpoint'd and the predecessor
  * dropped (the q145 block-manager discipline).
  */
object ByteBpe extends Serializable {

  final case class Merge(round: Int, left: String, right: String,
                         pairCount: Long, token: String)
  final case class Trained(merges: Seq[Merge])

  /** One piece per mapped character. The byte-level images all sit
    * below U+0144, so chars ARE code points here — no surrogates by
    * construction.
    */
  def decompose(mapped: String): Seq[String] =
    mapped.map(_.toString)

  /** Train `nMerges` merges over a (pretoken, count) table. */
  def train(words: Dataset[(String, Long)], nMerges: Int)
           (implicit spark: SparkSession): Trained = {
    import spark.implicits._
    require(nMerges >= 1 && nMerges <= 256)
    var cur = words.filter(_._1.nonEmpty)
      .map { case (w, c) => (decompose(w), c) }
      .toDF("pieces", "cnt").trackedCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to nMerges) {
      val top = cur
        .filter(size(col("pieces")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(pieces) - 1), " +
            "i -> struct(element_at(pieces, i) AS l, " +
            "element_at(pieces, i + 1) AS r))")).as("q"),
          col("cnt"))
        .groupBy(col("q.l").as("l"), col("q.r").as("r"))
        .agg(sum("cnt").as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("l").asc, col("r").asc)
        .select("l", "r", "pair_cnt")
        .limit(1).collect() // bounded: ONE row per round
      if (top.nonEmpty) {
        val (l, rr, cnt) = (top(0).getString(0),
          top(0).getString(1), top(0).getLong(2))
        val tok = l + rr
        merges += Merge(r, l, rr, cnt, tok)
        val next = cur.withColumn("pieces", rewrite(l, rr, tok))
          .trackedCheckpoint()
        graft.Checkpoints.drop(cur)
        cur = next
      }
    }
    graft.Checkpoints.drop(cur)
    Trained(merges.result())
  }

  /** Greedy left-to-right non-overlapping pair replacement as a pure
    * Column program (aggregate fold — codegen'd, no UDF; the
    * WordPiece rewrite's shape with plain concatenation).
    */
  private def rewrite(l: String, r: String,
                      tok: String): org.apache.spark.sql.Column = {
    val lq = l.replace("\\", "\\\\").replace("'", "\\'")
    val rq = r.replace("\\", "\\\\").replace("'", "\\'")
    val tq = tok.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""aggregate(
         |  pieces,
         |  struct(CAST(array() AS ARRAY<STRING>) AS acc,
         |         CAST(NULL AS STRING) AS held),
         |  (s, x) -> CASE
         |    WHEN s.held IS NULL AND x = '$lq' THEN
         |      struct(s.acc AS acc, x AS held)
         |    WHEN s.held IS NULL THEN
         |      struct(array_append(s.acc, x) AS acc,
         |             CAST(NULL AS STRING) AS held)
         |    WHEN x = '$rq' THEN
         |      struct(array_append(s.acc, '$tq') AS acc,
         |             CAST(NULL AS STRING) AS held)
         |    WHEN x = '$lq' THEN
         |      struct(array_append(s.acc, s.held) AS acc, x AS held)
         |    ELSE
         |      struct(array_append(array_append(s.acc, s.held), x)
         |               AS acc, CAST(NULL AS STRING) AS held)
         |  END,
         |  s -> CASE WHEN s.held IS NULL THEN s.acc
         |            ELSE array_append(s.acc, s.held) END)"""
        .stripMargin.replaceAll("\n", " "))
  }

  private def applyMerge(ps: Seq[String], l: String, r: String,
                         tok: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < ps.length) {
      if (i + 1 < ps.length && ps(i) == l && ps(i + 1) == r) {
        out += tok; i += 2
      } else { out += ps(i); i += 1 }
    }
    out.result()
  }

  /** TOTAL encode: merges applied in training order (the rank
    * rule). Always succeeds; concat(pieces) == mapped, always.
    */
  def encode(mapped: String, merges: Seq[Merge]): Seq[String] = {
    var ps = decompose(mapped)
    merges.foreach(m => ps = applyMerge(ps, m.left, m.right, m.token))
    ps
  }
}
