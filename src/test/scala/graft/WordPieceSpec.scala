package graft

import graft.operators.WordPiece
import org.apache.spark.sql.SparkSession

/** Pins the WordPiece trainer (q376) against an independent
  * in-memory reference implementation of the public likelihood rule
  * (score = pair/(left*right), lexicographic ties, greedy
  * left-to-right non-overlapping rewrite), plus the encoder's
  * greedy longest-match-first semantics and the [UNK] contract.
  */
class WordPieceSpec extends SparkSpec {

  /** Straight-line reference trainer (no Spark): the law twin. */
  private def referenceTrain(words: Seq[(String, Long)],
                             nMerges: Int)
      : Seq[(String, String, Long, String)] = {
    var cur = words.filterNot(_._1.isEmpty)
      .map { case (w, c) => (WordPiece.decompose(w).toList, c) }
    val out = Seq.newBuilder[(String, String, Long, String)]
    for (_ <- 1 to nMerges) {
      val pieceCnt = collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      val pairCnt = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      cur.foreach { case (ps, c) =>
        ps.foreach(p => pieceCnt(p) += c)
        ps.zip(ps.tail).foreach(q => pairCnt(q) += c)
      }
      if (pairCnt.nonEmpty) {
        val ((l, r), cnt) = pairCnt.toSeq.minBy { case ((l, r), c) =>
          (-c.toDouble / (pieceCnt(l).toDouble * pieceCnt(r)), l, r)
        }
        val tok = l + (if (r.startsWith("##")) r.substring(2) else r)
        out += ((l, r, cnt, tok))
        cur = cur.map { case (ps, c) =>
          val b = List.newBuilder[String]
          var rest = ps
          while (rest.nonEmpty) {
            rest match {
              case a :: bb :: t if a == l && bb == r =>
                b += tok; rest = t
              case a :: t => b += a; rest = t
              case Nil => ()
            }
          }
          (b.result(), c)
        }
      }
    }
    out.result()
  }

  private val corpus: Seq[(String, Long)] = Seq(
    "hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L,
    "hugs" -> 5L, "un" -> 7L, "gun" -> 3L, "b" -> 2L,
    "puns" -> 6L, "hut" -> 9L)

  test("distributed trainer ≡ in-memory reference: merges, order, " +
    "counts, joined tokens (the likelihood rule, not raw counts)") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val trained = WordPiece.train(corpus.toDS(), nMerges = 8)
    val want = referenceTrain(corpus, 8)
    assert(trained.merges.length == want.length)
    trained.merges.zip(want).foreach { case (m, (l, r, cnt, tok)) =>
      assert((m.left, m.right, m.pairCount, m.token) ==
        ((l, r, cnt, tok)), s"round ${m.round}")
    }
    // the rule is NOT BPE: the raw-count argmax at round 1 ("u","##n"
    // with 32) must lose to a rarer pair with rarer parts when the
    // likelihood says so — pin that the two rules actually diverge
    // on this corpus
    val pieceCnt = collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val pairCnt = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    corpus.foreach { case (w, c) =>
      val ps = WordPiece.decompose(w)
      ps.foreach(p => pieceCnt(p) += c)
      ps.zip(ps.tail).foreach(q => pairCnt(q) += c)
    }
    val bpePick = pairCnt.maxBy(_._2)._1
    val wpPick = (trained.merges.head.left, trained.merges.head.right)
    assert(bpePick != wpPick,
      "fixture must separate WordPiece from BPE")
  }

  test("vocab: alphabet (initial + ## continuations) plus one token " +
    "per merge; merges join with ## stripping") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val trained = WordPiece.train(corpus.toDS(), nMerges = 5)
    val chars = corpus.flatMap(w => WordPiece.decompose(w._1)).distinct
    assert(trained.alphabet.toSet == chars.toSet)
    assert(trained.vocab.length ==
      trained.alphabet.length + trained.merges.length)
    trained.merges.foreach { m =>
      assert(m.token == m.left +
        (if (m.right.startsWith("##")) m.right.substring(2)
        else m.right))
    }
  }

  test("encode: greedy longest-match-first, roundtrip concat, [UNK] " +
    "on any uncovered position, empty word is empty") {
    val vocab = Set("h", "##u", "##g", "hug", "##gs", "##s", "p",
      "##un", "b")
    assert(WordPiece.encode("hug", vocab).contains(Seq("hug")))
    // longest FIRST match wins at each position: "hugs" takes "hug"
    // then "##s" (not h + ##u + ##gs)
    assert(WordPiece.encode("hugs", vocab)
      .contains(Seq("hug", "##s")))
    assert(WordPiece.encode("pun", vocab).contains(Seq("p", "##un")))
    assert(WordPiece.encode("bug", vocab)
      .contains(Seq("b", "##u", "##g")))
    assert(WordPiece.encode("qux", vocab).isEmpty, "UNK fails whole")
    assert(WordPiece.encode("hugq", vocab).isEmpty)
    assert(WordPiece.encode("", vocab).contains(Nil))
    // every emitted piece IS the longest vocab match at its position
    val got = WordPiece.encode("hugs", vocab).get
    assert(WordPiece.concatPieces(got) == "hugs")
  }

  test("merge rewrite is greedy left-to-right non-overlapping: " +
    "a self-adjacent pair merges floor(n/2) times") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // word "aaaa" -> a ##a ##a ##a; ("az", 1000) inflates the
    // initial 'a' count so the likelihood rule picks the
    // self-adjacent (##a, ##a); the rewrite must merge it ONCE in
    // the 3-piece tail (greedy non-overlap), with the overlapping
    // pair statistic still 200
    val fixture = Seq(("aaaa", 100L), ("az", 1000L))
    val trained = WordPiece.train(fixture.toDS(), nMerges = 1)
    val m = trained.merges.head
    assert((m.left, m.right) == (("##a", "##a")))
    assert(m.pairCount == 200L,
      "pair statistic counts overlapping occurrences")
    val ref = referenceTrain(fixture, 1)
    assert((m.left, m.right, m.pairCount, m.token) == ref.head)
    // and the rewritten pieces agree: exactly one ##aa per word
    val enc = WordPiece.encode("aaaa",
      trained.vocab.toSet)
    assert(enc.contains(Seq("a", "##aa", "##a")),
      "greedy longest-match mirrors the single non-overlapping merge")
  }

  test("supplementary-plane code points are single pieces, never " +
    "surrogate halves (r16 ADVICE): decompose and encode agree") {
    val face = new String(Character.toChars(0x1F600)) // 2 UTF-16 chars
    val w = s"a${face}b"
    assert(WordPiece.decompose(w) == Seq("a", s"##$face", "##b"),
      "one piece per CODE POINT")
    // no piece may be a lone surrogate
    assert(WordPiece.decompose(face + face).forall(p =>
      !p.stripPrefix("##").exists(Character.isSurrogate) ||
        p.stripPrefix("##").length == 2))
    val vocab = Set("a", s"##$face", "##b")
    assert(WordPiece.encode(w, vocab)
      .contains(Seq("a", s"##$face", "##b")))
    assert(WordPiece.concatPieces(WordPiece.encode(w, vocab).get) == w)
    // a vocab that lacks the full code point cannot match half of it
    assert(WordPiece.encode(w, Set("a", "##b")).isEmpty)
  }
}
