package graft.operators

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
  * leaving the neighbor's boundary intact. The winner is asserted
  * letters-and-joiner only, so the literal pattern needs no quoting in
  * either engine.
  */
object BpeTrain {

  /** One merge-training row per round: (round, lhs, rhs, pair_count,
    * tokens_after). `pair_count` counts OVERLAPPING adjacent
    * occurrences (the BPE ranking statistic); `tokens_after` is the
    * corpus token count after applying the round's merge, which pins
    * the rewrite itself, not just the argmax.
    */
  def mergeRounds(docs: DataFrame, text: Column, rounds: Int,
                  joiner: String = "@"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(joiner.nonEmpty && !joiner.exists(" \\[](){}*+?.^$|".contains(_)),
      s"joiner '$joiner' must be non-empty and regex-literal")
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus = docs.select(text.cast("string").as("txt"))
      .filter(col("txt").isNotNull)
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
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
      require((l + rr).forall(c => c.isLetterOrDigit || joiner.contains(c)),
        s"winning pair ('$l','$rr') is not regex-literal safe")
      corpus = corpus.select(
        array_join(
          filter(
            split(regexp_replace(
              concat(lit(" "), expr("replace(txt, ' ', '  ')"), lit(" ")),
              lit(s" $l  $rr "), lit(s" $l$joiner$rr ")), " "),
            x => x =!= ""),
          " ").as("txt"))
        .localCheckpoint()
      val tokensAfter =
        corpus.agg(sum(size(split(col("txt"), " ")))).as[Long].head()
      out += ((r, l, rr, cnt, tokensAfter))
    }
    out.result().toDF("round", "lhs", "rhs", "pair_count", "tokens_after")
  }
}
