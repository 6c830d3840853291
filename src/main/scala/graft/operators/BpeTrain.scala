package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed BPE merge training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * algorithm 1 — lifted from characters to whitespace tokens): each
  * round counts every ADJACENT token pair across the corpus, picks the
  * most frequent (ties broken lexicographically on (left, right)), and
  * greedily merges its left-to-right non-overlapping occurrences into a
  * single joined token. The per-round merge table these rounds emit IS
  * the trained tokenizer — the artifact a training pipeline ships.
  *
  * Scale (100 TB): each round is one map-side bigram explode feeding a
  * partially-aggregated pair count (the round's only shuffle), a
  * TakeOrderedAndProject(1) argmax, and a full-corpus projection that
  * applies the merge — the winning pair travels into the next round's
  * plan as a LITERAL, never as shipped state. The corpus is
  * localCheckpoint'd per round so round r's scan does not replay rounds
  * 1..r-1's rewrites. Driver traffic is one (pair, count) row plus one
  * scalar per round — bounded by construction, the same contract as the
  * k-means centroid collect.
  *
  * Merge application is regexp_replace over a double-spaced padded form
  * (" l  r " → " l·r "): left-to-right non-overlapping replacement is
  * exactly BPE's greedy merge order ("a a a" merges once), and Spark
  * (java.util.regex) and the DuckDB oracle (RE2, 'g') implement that
  * semantic identically. Double-spacing makes consecutive occurrences
  * independent — the pattern consumes one boundary space on each side,
  * leaving the neighbor's boundary intact. The winning pair rides the
  * pattern inside \Q...\E literal quoting (shared Java-regex/RE2
  * syntax), so punctuation tokens — guaranteed in real text — train
  * fine; the replacement is escaped per-engine (Java interprets $ and
  * \ in replacements, RE2 interprets \), so the only residual domain
  * guard is a token containing the literal two-char sequence \E, which
  * \Q quoting cannot span.
  */
object BpeTrain {

  /** The shared greedy training loop: per round, count adjacent pairs
    * over `txt`, collect the argmax (ONE row to the driver), rewrite
    * `txt` in place with the winning merge. Any passthrough columns on
    * `corpus0` (doc ids, pre-encode counts) ride along untouched —
    * `mergeRounds` carries none, `encodeCorpus` carries the doc key.
    * Returns the final corpus; `afterRound` sees each round's winner
    * plus the rewritten corpus.
    */
  private def mergeLoop(corpus0: DataFrame, rounds: Int, joiner: String)(
      afterRound: (Int, String, String, Long, DataFrame) => Unit): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(joiner.nonEmpty && !joiner.contains(" "),
      s"joiner '$joiner' must be non-empty and space-free")
    var corpus = corpus0.trackedCheckpoint()
    for (r <- 1 to rounds) {
      val top = corpus
        .select(split(col("txt"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"no adjacent token pairs in corpus at round $r")
      val (l, rr, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      require(!s" $l  $rr ".contains("\\E"),
        s"winning pair ('$l','$rr') contains \\E — \\Q quoting cannot span it")
      // \Q..\E quotes the pair as a literal in BOTH engines; the Java
      // replacement additionally escapes $ and \ (Matcher semantics)
      val pat = s" \\Q$l\\E  \\Q$rr\\E "
      val rep = java.util.regex.Matcher.quoteReplacement(s" $l$joiner$rr ")
      val next = corpus.withColumn("txt",
        array_join(
          filter(
            split(regexp_replace(
              concat(lit(" "), expr("replace(txt, ' ', '  ')"), lit(" ")),
              lit(pat), lit(rep)), " "),
            x => x =!= ""),
          " "))
        .trackedCheckpoint()
      // round r−1's corpus blocks are dead once round r is materialized
      // — without this, `rounds` full corpus copies pile up in the block
      // manager for the life of the session
      graft.Checkpoints.drop(corpus)
      corpus = next
      afterRound(r, l, rr, cnt, corpus)
    }
    corpus
  }

  /** One merge-training row per round: (round, lhs, rhs, pair_count,
    * tokens_after). `pair_count` counts OVERLAPPING adjacent
    * occurrences (the BPE ranking statistic); `tokens_after` is the
    * corpus token count after applying the round's merge, which pins
    * the rewrite itself, not just the argmax.
    */
  def mergeRounds(docs: DataFrame, text: Column, rounds: Int,
                  joiner: String = "@"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val corpus0 = docs.select(text.cast("string").as("txt"))
      .filter(col("txt").isNotNull)
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
    mergeLoop(corpus0, rounds, joiner) { (r, l, rr, cnt, corpus) =>
      val tokensAfter =
        corpus.agg(sum(size(split(col("txt"), " ")))).as[Long].head()
      out += ((r, l, rr, cnt, tokensAfter))
    }
    out.result().toDF("round", "lhs", "rhs", "pair_count", "tokens_after")
  }

  /** Tokenizer APPLICATION: train `rounds` merges on the corpus itself
    * and return each document encoded with them — (id, n_tok_orig,
    * n_tok_enc, fertility). Fertility (encoded-to-original token ratio,
    * the statistic tokenizer evaluations report per language/domain) is
    * a single IEEE division of two exact longs, rounded at 6 dp.
    *
    * Scale: identical shape to [[mergeRounds]] — the id and the
    * pre-encode count ride the corpus as passthrough columns, so
    * encoding adds zero shuffles and zero extra driver actions on top
    * of training (no per-round token-count agg here).
    */
  def encodeCorpus(docs: DataFrame, text: Column, id: Column, rounds: Int,
                   joiner: String = "@"): DataFrame = {
    val corpus0 = docs
      .select(id.as("doc_id"), text.cast("string").as("txt"))
      .filter(col("txt").isNotNull)
      .withColumn("n0", size(split(col("txt"), " ")).cast("long"))
    mergeLoop(corpus0, rounds, joiner) { (_, _, _, _, _) => () }
      .select(col("doc_id"), col("n0").as("n_tok_orig"),
        size(split(col("txt"), " ")).cast("long").as("n_tok_enc"),
        round(size(split(col("txt"), " ")).cast("double") / col("n0"), 6)
          .as("fertility"))
  }
}
