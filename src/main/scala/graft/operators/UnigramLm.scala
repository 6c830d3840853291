package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer training (q357) — the
  * SentencePiece EM alternative to BPE (Kudo 2018, public paper), as
  * set-oriented aggregations.
  *
  * Reference twin: the reference has no tokenizer at all; this closes
  * the north-star item next to the engine's BPE pair (q145 merge
  * training / q152 encoding): most modern tokenizers train the
  * unigram model, not BPE.
  *
  * Scale shape (the part that must survive 100 TB): the CORPUS side
  * is never collected — word counting is one hash aggregation,
  * seeding is a flatMap over distinct words + one aggregation +
  * top-M, and each EM epoch is one flatMap (forward-backward per
  * distinct word, weighted by its count) + one aggregation. Only the
  * VOCAB crosses to the driver — bounded by construction (M + the
  * alphabet), the same adjudicated ≤|centroids| pattern as IVF.
  * Distinct words are checkpointed once and reused across epochs.
  *
  * EM correctness: the E-step computes exact segmentation marginals
  * by forward-backward over the word lattice, so corpus
  * log-likelihood is non-decreasing per epoch (the law q357 pins);
  * Viterbi encoding of held-out text must reconstruct every word
  * byte-exactly from vocab pieces (coverage: every corpus character
  * is a vocab piece).
  */
object UnigramLm extends Serializable {

  final case class Epoch(epoch: Int, ll: Double)
  final case class Trained(vocab: Map[String, Double],
                           epochs: Seq[Epoch])

  /** Forward pass marginals. Returns (alpha, Z) in linear space —
    * words are short, doubles carry it.
    */
  private def forward(w: String, vocab: Map[String, Double],
                      maxPiece: Int): Array[Double] = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPiece)
      var acc = 0.0
      while (i < j) {
        if (alpha(i) > 0) {
          val p = vocab.getOrElse(w.substring(i, j), 0.0)
          if (p > 0) acc += alpha(i) * p
        }
        i += 1
      }
      alpha(j) = acc
      j += 1
    }
    alpha
  }

  /** Train on `words` (word, count): seed = alphabet + top-M
    * substrings (length 2..maxPiece, corpus frequency >= 2) scored by
    * freq*len, then `epochs` exact EM passes.
    */
  def train(words: Dataset[(String, Long)], m: Int, maxPiece: Int,
            epochs: Int)(implicit s: SparkSession): Trained = {
    import s.implicits._
    val cached = words.toDF("w", "c").trackedCheckpoint()
      .as[(String, Long)]
    // alphabet: every char must be a piece (coverage law)
    val chars = cached.flatMap { case (w, c) =>
      w.map(ch => (ch.toString, c))
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect() // bounded: |alphabet|
    // substring candidates, corpus-weighted
    val subs = cached.flatMap { case (w, c) =>
      for {
        len <- 2 to math.min(maxPiece, w.length)
        i <- 0 to w.length - len
      } yield (w.substring(i, i + len), c)
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .filter(_._2 >= 2L)
      .map { case (p, c) => (p, c * p.length) }
      .orderBy(desc("_2"), asc("_1"))
      .limit(m)
      .collect() // bounded: M
    // disjoint keys: chars are length 1, candidates length >= 2
    val seed = (chars ++ subs).toMap
    val total = seed.values.map(_.toDouble).sum
    var vocab = seed.map { case (p, c) => (p, c.toDouble / total) }
    val eps = Seq.newBuilder[Epoch]
    var e = 0
    while (e < epochs) {
      val bc = s.sparkContext.broadcast(vocab)
      val stats = cached.flatMap { case (w, c) =>
        val v = bc.value
        val n = w.length
        val alpha = forward(w, v, maxPiece)
        val z = alpha(n)
        if (z <= 0) Seq(("", Double.NaN)) // coverage break
        else {
          // backward pass
          val beta = new Array[Double](n + 1)
          beta(n) = 1.0
          var i = n - 1
          while (i >= 0) {
            var acc = 0.0
            var j = i + 1
            val jmax = math.min(n, i + maxPiece)
            while (j <= jmax) {
              val p = v.getOrElse(w.substring(i, j), 0.0)
              if (p > 0 && beta(j) > 0) acc += p * beta(j)
              j += 1
            }
            beta(i) = acc
            i -= 1
          }
          val out = Seq.newBuilder[(String, Double)]
          out += (("", c * math.log(z)))
          var a = 0
          while (a < n) {
            if (alpha(a) > 0) {
              var b = a + 1
              val bmax = math.min(n, a + maxPiece)
              while (b <= bmax) {
                val piece = w.substring(a, b)
                val p = v.getOrElse(piece, 0.0)
                if (p > 0 && beta(b) > 0)
                  out += ((piece, c * alpha(a) * p * beta(b) / z))
                b += 1
              }
            }
            a += 1
          }
          out.result()
        }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect() // bounded: vocab size + 1
      bc.destroy()
      val ll = stats.find(_._1 == "").map(_._2).getOrElse(0.0)
      val exp = stats.filter(_._1 != "").toMap
      val totalExp = exp.values.sum
      vocab = vocab.map { case (p, _) =>
        (p, exp.getOrElse(p, 0.0) / totalExp)
      }.filter { case (p, pr) => pr > 0 || p.length == 1 }
      // alphabet floor: a zero-mass char would break coverage
      val minP = vocab.values.filter(_ > 0).minOption.getOrElse(1.0)
      vocab = vocab.map { case (p, pr) =>
        if (pr == 0.0) (p, minP * 1e-3) else (p, pr)
      }
      eps += Epoch(e, ll)
      e += 1
    }
    Trained(vocab, eps.result())
  }

  /** Viterbi segmentation under the trained model. Empty when the
    * word has no full-coverage path.
    */
  def viterbi(w: String, vocab: Map[String, Double],
              maxPiece: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        val p = vocab.getOrElse(w.substring(i, j), 0.0)
        if (p > 0 && best(i) != Double.NegativeInfinity) {
          val cand = best(i) + math.log(p)
          if (cand > best(j)) { best(j) = cand; back(j) = i }
        }
        i += 1
      }
      j += 1
    }
    if (best(n) == Double.NegativeInfinity) Nil
    else {
      val stack = scala.collection.mutable.Stack.empty[String]
      var at = n
      while (at > 0) {
        stack.push(w.substring(back(at), at))
        at = back(at)
      }
      stack.toSeq
    }
  }
}
