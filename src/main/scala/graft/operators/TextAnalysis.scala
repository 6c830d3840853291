package graft.operators

import org.apache.spark.sql.Column
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs); every
  * primitive has an exact ANSI-SQL equivalent so the DuckDB oracle can
  * replicate results bit-for-bit. Designed to run as a single projection
  * over a 100 TB `documents` scan — no shuffle, no state.
  *
  * The stopword scoring that langId/qualityScore share is a fused native
  * expression (graft.expressions.StopwordScores): one token pass per
  * document instead of five tokenize+filter chains. The composed forms
  * below (`*Composed`) remain the executable spec, pinned bit-equivalent
  * in OperatorsSpec.
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap, deterministic
    * proxy for subword tokenizers.
    */
  def bpeishTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** Stopword tables for the n-gram language-ID heuristic (canonical copy
    * lives with the fused expression). Order is the tie-break (first wins).
    */
  val langStopwords: Seq[(String, Seq[String])] =
    graft.expressions.StopwordScores.langs

  /** All five stopword-hit counts (en, es, fr, de, distinct-union) in one
    * fused token pass.
    */
  def stopwordScores(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.StopwordScores(
        org.apache.spark.sql.graft.ColumnBridge.expression(text.cast("string"))))

  /** Per-language stopword hit count (composed spec form). */
  def langScore(text: Column, lang: String): Column =
    score(text, langStopwords.toMap.apply(lang))

  private def score(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === w).reduce(_ || _)))

  /** Language ID: stopword-hit argmax with first-wins tie-break in
    * `langStopwords` order; "unknown" when no list scores. Scores come
    * from ONE fused pass (codegen subexpression elimination collapses the
    * repeated reference).
    */
  def langId(text: Column): Column = {
    val sc = stopwordScores(text)
    langIdFrom((1 to 4).map(i => element_at(sc, i)))
  }

  /** Composed twin of [[langId]] (five tokenize+filter chains). */
  def langIdComposed(text: Column): Column =
    langIdFrom(langStopwords.map { case (_, ws) => score(text, ws) })

  private def langIdFrom(scores: Seq[Column]): Column = {
    val Seq(en, es, fr, de) = scores
    when(en > 0 && en >= es && en >= fr && en >= de, "en")
      .when(es > 0 && es >= fr && es >= de, "es")
      .when(fr > 0 && fr >= de, "fr")
      .when(de > 0, "de")
      .otherwise("unknown")
  }

  /** Quality score in [0,1]: length component (saturating at 100 tokens),
    * alphanumeric cleanliness, and stopword density. Deterministic double
    * math (same operand order as the SQL oracle).
    */
  def qualityScore(text: Column): Column =
    qualityFrom(text, element_at(stopwordScores(text), 5).cast("double"))

  /** Composed twin of [[qualityScore]]. */
  def qualityScoreComposed(text: Column): Column =
    qualityFrom(text,
      score(text, graft.expressions.StopwordScores.allStop).cast("double"))

  private def qualityFrom(text: Column, nStop: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val nClean = length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")).cast("double")
    val lengthScore = least(lit(1.0), nTok / 100.0)
    val cleanScore = nClean / nChars
    val stopScore = nStop / nTok
    round(lengthScore * 0.4 + cleanScore * 0.3 + stopScore * 0.3, 6)
  }

  /** Document fingerprint: md5 over the lowercased alphanumeric skeleton —
    * whitespace/punctuation-invariant exact-dup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Signed feature-hashing vectorizer (the "hashing trick"): each token
    * lands in dimension hash60(t) mod `dims` with sign from the next
    * hash bit; the document vector is the per-dimension sum. The
    * vocabulary-free text→vector bridge: no dictionary to build,
    * broadcast, or keep consistent across 100 TB — the hash IS the
    * vocabulary, so the pass stays a zero-shuffle projection and two
    * corpora vectorized independently are directly comparable.
    *
    * One md5 per token, one tight loop per document (fused native
    * expression graft.expressions.HashingVec; the composed
    * aggregate-fold form below is the executable spec it is pinned
    * bit-equivalent to). Integer weights make downstream sums/cosines
    * exact and the DuckDB oracle bit-reproducible.
    */
  def hashingVector(text: Column, dims: Int = 16): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HashingVec(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          text.cast("string")), dims))

  /** HTML → text extraction (the WET-style stage a web-crawl pipeline
    * runs before any text analysis): drop script/style/comment blocks,
    * strip tags, decode the five XML entities, collapse whitespace.
    * A pure chained-regexp projection — codegen'd, zero shuffle at any
    * corpus size — and every pattern is shared Java-regex/RE2 syntax
    * (non-greedy dot, character classes; NO lookaround or backrefs), so
    * the DuckDB oracle runs the IDENTICAL patterns. The block patterns
    * carry `(?s)`: real crawled script/style/comment blocks span lines,
    * and without DOTALL the non-greedy dot stops at `\n` — the block
    * body would leak into the text. `&amp;` decodes LAST so `&amp;lt;`
    * yields the literal `&lt;` (the standard double-escape rule).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (ent, ch)) => regexp_replace(c, ent, ch)
    }
    // explicit class, not \s: Java \s includes \x0B, RE2's does not —
    // the one whitespace spelling the two engines disagree on
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** Count-min sketch slot coordinates of one term: an array of
    * (d, slot) structs, slot_d = hash60("cms<d>:" || term) mod `w`.
    * ONE implementation shared by the batch sketch (q142) and the
    * streaming fold (`StreamOps.cmsBatch`), so stream ≡ batch holds by
    * construction; the seeded-md5 spelling reproduces exactly in the
    * DuckDB oracle.
    */
  def cmsSlots(term: Column, w: Int, depth: Int): Column =
    array((0 until depth).map(dd =>
      struct(lit(dd).as("d"),
        pmod(graft.functions.hash60(lit(s"cms$dd"), term),
          lit(w.toLong)).as("slot"))): _*)

  /** Composed built-in form of [[hashingVector]] (executable spec). */
  def hashingVectorComposed(text: Column, dims: Int = 16): Column = {
    val hs = transform(tokens(text), t => graft.functions.hash60(t))
    aggregate(hs, array_repeat(lit(0L), dims), (acc, h) => {
      val sgn = when(shiftright(h, 4).bitwiseAND(lit(1L)) === 1, lit(1L))
        .otherwise(lit(-1L))
      transform(acc, (v, i) => v + when(pmod(h, lit(dims)) === i, sgn)
        .otherwise(lit(0L)))
    })
  }
}
