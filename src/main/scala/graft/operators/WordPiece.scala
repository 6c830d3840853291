package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed WORDPIECE training — the third tokenizer family next
  * to BPE (q145/q152) and the unigram LM (q357), and the one BERT's
  * lineage ships. Training is the public likelihood-ranked merge
  * loop (Schuster & Nakajima 2012; the HuggingFace tokenizers
  * trainer's documented rule): words decompose into characters (the
  * first bare, the rest `##`-prefixed continuations); each round
  * counts, across the distinct-word corpus, every adjacent piece
  * pair and every piece occurrence, and merges the pair maximizing
  *
  *   score(l, r) = count(l, r) / (count(l) * count(r))
  *
  * — frequency normalized by the parts' own frequencies, so a merge
  * must earn MORE than its parts' popularity (the exact property
  * separating WordPiece from BPE's raw-count argmax; ties break
  * lexicographically). Encoding is greedy LONGEST-MATCH-FIRST over
  * the vocab, whole word -> [UNK] when any position has no match —
  * the reference runtime's semantics.
  *
  * Scale (100 TB): the state is the DISTINCT-WORD table with counts
  * (corpus-size-independent), pieces ride as arrays, each round is
  * two partial aggregations (pair counts, piece counts) and a
  * broadcast-joined TakeOrdered(1) argmax — ONE (pair, score) row to
  * the driver per round, the adjudicated bounded-collect contract;
  * the winning pair travels into the rewrite as a literal. The
  * per-round state is trackedCheckpoint'd and the predecessor
  * dropped, the q145 block-manager discipline.
  */
object WordPiece extends Serializable {

  final case class Merge(round: Int, left: String, right: String,
                         pairCount: Long, score: Double,
                         token: String)
  final case class Trained(merges: Seq[Merge], alphabet: Seq[String],
                           vocab: Seq[String])

  /** `##`-stripping join: merging ("##a", "##b") yields "##ab";
    * ("a", "##b") yields "ab".
    */
  private def joinPieces(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Decompose one word into initial + continuation character
    * pieces. Iterates CODE POINTS, not UTF-16 chars — a
    * supplementary-plane character is one piece, never two surrogate
    * halves.
    */
  def decompose(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (i == 0) s else s"##$s")
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Train `nMerges` merges over a (word, count) table. */
  def train(words: Dataset[(String, Long)], nMerges: Int)
           (implicit spark: SparkSession): Trained = {
    import spark.implicits._
    require(nMerges >= 1 && nMerges <= 256)
    var cur = words.filter(_._1.nonEmpty)
      .map { case (w, c) => (decompose(w), c) }
      .toDF("pieces", "cnt").trackedCheckpoint()
    val alphabet = cur
      .select(explode(col("pieces")).as("p")).distinct()
      .as[String].collect().sorted.toSeq // bounded: |alphabet|
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to nMerges) {
      val pieceCounts = cur
        .select(explode(col("pieces")).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("pc"))
      val pairCounts = cur
        .filter(size(col("pieces")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(pieces) - 1), " +
            "i -> struct(element_at(pieces, i) AS l, " +
            "element_at(pieces, i + 1) AS r))")).as("q"),
          col("cnt"))
        .groupBy(col("q.l").as("l"), col("q.r").as("r"))
        .agg(sum("cnt").as("pair_cnt"))
      val top = pairCounts
        .join(broadcast(pieceCounts.withColumnRenamed("p", "l")
          .withColumnRenamed("pc", "lc")), "l")
        .join(broadcast(pieceCounts.withColumnRenamed("p", "r")
          .withColumnRenamed("pc", "rc")), "r")
        .withColumn("score", col("pair_cnt").cast("double") /
          (col("lc").cast("double") * col("rc").cast("double")))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .select("l", "r", "pair_cnt", "score")
        .limit(1).collect() // bounded: ONE row per round
      if (top.nonEmpty) {
        val (l, rr, cnt, sc) = (top(0).getString(0),
          top(0).getString(1), top(0).getLong(2), top(0).getDouble(3))
        val tok = joinPieces(l, rr)
        merges += Merge(r, l, rr, cnt, sc, tok)
        // greedy left-to-right non-overlapping rewrite of the pair
        val rewrite = udfFree(l, rr, tok)
        val next = cur.withColumn("pieces", rewrite)
          .trackedCheckpoint()
        graft.Checkpoints.drop(cur)
        cur = next
      }
    }
    graft.Checkpoints.drop(cur)
    val ms = merges.result()
    Trained(ms, alphabet, alphabet ++ ms.map(_.token))
  }

  /** The merge rewrite as a pure Column program (aggregate fold over
    * the piece array — codegen'd, no UDF): left-to-right
    * non-overlapping replacement of the adjacent pair (l, r) by
    * `tok`.
    */
  private def udfFree(l: String, r: String,
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

  /** Greedy longest-match-first encode; None = [UNK] (whole word). */
  def encode(w: String, vocab: Set[String]): Option[Seq[String]] = {
    if (w.isEmpty) return Some(Nil)
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var end = w.length
      var hit: String = null
      while (hit == null && end > pos) {
        val cand =
          (if (pos == 0) "" else "##") + w.substring(pos, end)
        if (vocab.contains(cand)) hit = cand
        else {
          // shrink by CODE POINTS: never leave `end` between the
          // halves of a surrogate pair (mirrors decompose)
          end -= 1
          if (end > pos && Character.isLowSurrogate(w.charAt(end)) &&
            Character.isHighSurrogate(w.charAt(end - 1))) end -= 1
        }
      }
      if (hit == null) return None
      out += hit
      pos = end
    }
    Some(out.result())
  }

  /** Strip the continuation prefix — encode-roundtrip check. */
  def concatPieces(pieces: Seq[String]): String =
    pieces.zipWithIndex.map { case (p, i) =>
      if (i == 0) p else p.stripPrefix("##")
    }.mkString
}
