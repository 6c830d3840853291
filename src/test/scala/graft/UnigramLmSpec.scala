package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.SparkSession

/** Pins the unigram-LM trainer (q357): EM monotonicity with exact
  * marginals, multi-char pieces absorbing probability mass, Viterbi
  * reconstruction and preference for learned pieces.
  */
class UnigramLmSpec extends SparkSpec {

  private def trainOn(words: Seq[(String, Long)], epochs: Int = 5)
      : UnigramLm.Trained = {
    implicit val s: SparkSession = spark
    import s.implicits._
    UnigramLm.train(words.toDS(), m = 50, maxPiece = 6,
      epochs = epochs)
  }

  test("EM: log-likelihood non-decreasing, repeated substrings " +
    "become high-probability pieces") {
    val t = trainOn(Seq(("tokenize", 40L), ("tokens", 60L),
      ("table", 10L), ("scan", 25L), ("scans", 15L)))
    val lls = t.epochs.map(_.ll)
    assert(lls.zip(lls.tail).forall { case (a, b) =>
      b >= a - math.abs(a) * 1e-9
    }, lls.toString)
    // "token" (freq 100, len 5) must out-mass any single char
    val pTok = t.vocab.getOrElse("token", 0.0)
    assert(pTok > 0 && pTok > t.vocab("b"))
  }

  test("viterbi: reconstructs exactly, prefers learned pieces, " +
    "closes on uncovered input") {
    val t = trainOn(Seq(("abcabc", 50L), ("abcd", 30L), ("x", 1L)))
    val seg = UnigramLm.viterbi("abcabcd", t.vocab, maxPiece = 6)
    assert(seg.mkString == "abcabcd")
    assert(seg.contains("abc")) // the dominant piece is used
    assert(UnigramLm.viterbi("zzz", t.vocab, maxPiece = 6).isEmpty)
    assert(UnigramLm.viterbi("", t.vocab, maxPiece = 6).isEmpty ||
      UnigramLm.viterbi("", t.vocab, maxPiece = 6) == Nil)
  }

  test("coverage: every alphabet char stays a piece with positive " +
    "probability even when larger pieces absorb all mass") {
    val t = trainOn(Seq(("aaaa", 100L)))
    assert(t.vocab("a") > 0)
    assert(UnigramLm.viterbi("a", t.vocab, maxPiece = 6) == Seq("a"))
  }
}
