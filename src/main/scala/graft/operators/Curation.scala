package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training pipeline runs between
  * raw scan and tokenization: benchmark decontamination, PII redaction,
  * sub-document (passage) dedup, and token-budget selection. No reference
  * analog — north-star extensions alongside `Dedup`/`TextAnalysis`.
  *
  * All four are shuffle-minimal by construction: redaction is a pure
  * codegen'd projection; passage dedup and decontamination shuffle once on
  * the gram/passage key (the key the semantics require); budget selection
  * shuffles once on the stratum key.
  */
object Curation {

  /** Distinct word w-grams per row, exploded to (doc_id, gram). Native
    * single-pass generator (`expressions/ShingleExplode`); the composed
    * twin below is the executable spec, equivalence pinned in
    * `CurationSpec`.
    */
  def gramTable(df: DataFrame, text: Column, id: Column, w: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(id.as("doc_id"),
      ColumnBridge.column(graft.expressions.ShingleExplode(
        ColumnBridge.expression(text.cast("string")), w)).as("gram"))
  }

  /** Composed-builtin twin of [[gramTable]] (the spec form). */
  def gramTableComposed(df: DataFrame, text: Column, id: Column, w: Int): DataFrame =
    df.select(id.as("doc_id"), explode(Dedup.shingles(text, w)).as("gram"))

  /** Benchmark decontamination (n-gram overlap screen): for every train
    * doc, how many distinct word w-grams it shares with ANY eval doc, plus
    * a flag at `minShared`. Returns only docs with ≥1 shared gram.
    *
    * Scale shape: the eval gram set is orders of magnitude smaller than
    * the train side (eval benchmarks are tiny), so it broadcasts and the
    * probe is map-side; past the broadcast threshold Spark falls back to a
    * shuffle join on `gram` — or pre-prune with `Engine.bloomPrune`.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, text: Column,
                   id: Column, w: Int = 3, minShared: Int = 5): DataFrame = {
    val tr = gramTable(train, text, id, w)
    val ev = gramTable(eval, text, id, w).select(col("gram")).distinct()
    // grams are distinct per doc and ev is distinct, so each match is one
    // row — count(1) IS the distinct shared-gram count, no second distinct.
    tr.join(broadcast(ev), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .select(col("doc_id"), col("n_shared_grams"),
        (col("n_shared_grams") >= minShared).cast("int").as("flagged"))
  }

  /** Bloom-filter decontamination: [[ngramOverlap]]'s posture when the
    * eval gram union is too large to broadcast exactly (many benchmarks
    * pooled — the screen The Stack / RefinedWeb pipelines run). The eval
    * side folds into an mBits-bit Bloom filter (k seeded md5 hashes,
    * packed into mBits/64 longs assembled DISTRIBUTED via bit_or — no
    * driver collect); the single-row filter broadcasts and the train
    * probe is a map-side bit test. ~10 bits per eval gram replaces the
    * gram strings themselves.
    *
    * Returns (doc_id, n_bloom_hits, n_exact, flagged) for EVERY train
    * doc: n_bloom_hits counts the doc's distinct grams whose k bits all
    * hit; n_exact the truly-shared grams (n_exact <= n_bloom_hits always
    * — the gap audits the false-positive rate, the same
    * sketch-vs-truth audit shape as the q142 CMS overcount column).
    * `flagged` decides on the SKETCH (>= minShared bloom hits) — the
    * decision a pipeline that dropped the exact column would ship. The
    * seeded-md5 bit positions reproduce exactly in the SQL oracle, which
    * deliberately spells membership as a position-set join rather than
    * packed words — an independent formulation of the same filter.
    */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame, text: Column,
                         id: Column, w: Int = 3, mBits: Int = 65536,
                         k: Int = 3, minShared: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && mBits >= 64, s"mBits must be a multiple of 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val ev = gramTable(eval, text, id, w).select(col("gram")).distinct()
    val filterRow = assembleBloom(bloomWords(ev, mBits, k), mBits)
    val probed = bloomProbe(
      gramTable(train, text, id, w)
        .crossJoin(broadcast(filterRow))
        .join(broadcast(ev.withColumn("__e", lit(1L))), Seq("gram"), "left"),
      mBits, k)
    probed
      .groupBy(col("doc_id"))
      .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(coalesce(col("__e"), lit(0L))).as("n_exact"))
      .select(col("doc_id"), col("n_bloom_hits"), col("n_exact"),
        (col("n_bloom_hits") >= minShared).cast("int").as("flagged"))
  }

  /** The shared probe stage of [[bloomDecontaminate]] and
    * [[bloomScreen]]: given (…, gram, bf) rows, add `__hit` — all k
    * seeded bits set. A per-row `assert_true` (the q135 packing-guard
    * pattern) pins the filter's width to `mBits`: a Bloom filter must
    * never false-negative, and probing a filter built at a DIFFERENT
    * mBits would do exactly that silently — better a loud runtime
    * error than a contaminated training set.
    */
  private def bloomProbe(grams: DataFrame, mBits: Int, k: Int): DataFrame = {
    var probed = grams
    for (j <- 0 until k)
      probed = probed.withColumn(s"__p$j", bloomBitPos(j, col("gram"), mBits))
    val hitCol = (0 until k).map(j => expr(
      s"(element_at(bf, CAST(__p$j DIV 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(__p$j % 64 AS INT))) != 0"))
      .reduce(_ && _)
    val widthGuard = coalesce(
      assert_true(size(col("bf")) === mBits / 64,
        lit(s"bloom filter width != mBits=$mBits")).cast("long"), lit(0L))
    probed.withColumn("__hit", hitCol && (col("__p0") + widthGuard >= 0))
  }

  /** Probe-only decontamination screen against a PRE-BUILT packed
    * filter (one `bf` array row — [[bloomDecontaminate]]'s internal
    * build, or `StreamOps.finishBloomStream`'s fold of a streamed eval
    * set): per train doc, distinct grams whose k bits all hit, and the
    * flag at `minShared`. This is the production shape when the eval
    * gram STRINGS were never retained — only the ~10-bits-per-gram
    * filter ships, broadcasts, and probes map-side; there is no
    * n_exact audit column because exactness is unavailable by design.
    */
  def bloomScreen(train: DataFrame, filterRow: DataFrame, text: Column,
                  id: Column, w: Int = 3, mBits: Int = 65536, k: Int = 3,
                  minShared: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && mBits >= 64, s"mBits must be a multiple of 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    bloomProbe(gramTable(train, text, id, w)
        .crossJoin(broadcast(filterRow)), mBits, k)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_bloom_hits"),
        (col("n_bloom_hits") >= minShared).cast("int").as("flagged"))
  }

  /** Bit position j of gram `g` in an `mBits`-bit Bloom filter — the
    * ONE definition [[bloomDecontaminate]], its oracle spelling, and
    * the streaming filter maintenance (`StreamOps.bloomIngest`) all
    * share, so stream ≡ batch holds by construction.
    */
  private[graft] def bloomBitPos(j: Int, g: Column, mBits: Int): Column =
    pmod(graft.functions.hash60(lit(s"bf$j"), g), lit(mBits.toLong))

  /** Distinct grams → per-word partial OR rows (wi, word): ≤ mBits/64
    * rows regardless of input size — the mergeable (idempotent,
    * commutative, associative under `bit_or`) state the streaming
    * filter persists per batch.
    */
  private[graft] def bloomWords(grams: DataFrame, mBits: Int, k: Int): DataFrame =
    grams.select(explode(array(
        (0 until k).map(j => bloomBitPos(j, col("gram"), mBits)): _*)).as("p"))
      .select(expr("p DIV 64").as("wi"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("b"))
      .groupBy(col("wi")).agg(expr("bit_or(b)").as("word"))

  /** Fold (wi, word) rows into the single-row packed filter: one
    * mBits/64-long array, absent words zero.
    */
  private[graft] def assembleBloom(words: DataFrame, mBits: Int): DataFrame =
    words
      .agg(map_from_entries(collect_list(struct(col("wi"), col("word")))).as("m"))
      .select(transform(sequence(lit(0L), lit((mBits / 64 - 1).toLong)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bf"))

  /** Mixture oversampling schedule (the data-recipe step of LLaMA /
    * GPT-3-style training sets: each source/language stratum is sampled
    * toward a TARGET share of the token budget, oversampling small
    * strata by integer repeats). For stratum s with token mass T_s out
    * of T and target weight w_s (permille), the replica rate is
    * r_s = w_s·T/(1000·T_s) epochs: every doc gets floor(r_s) replicas,
    * plus one more iff a seeded per-doc hash falls under frac(r_s) —
    * deterministic Bernoulli, no RNG state. Returns the replicated
    * schedule (doc_id, stratum, rep), rep = 1..n_replicas.
    *
    * All arithmetic is BIGINT ppm (w_s·T·1000 DIV T_s) — no floats, so
    * engines agree bit-for-bit. (At 100 TB token counts, w·T·1000
    * approaches 2^63 — switch the rate computation to DECIMAL(38,0);
    * the schedule itself is unchanged.) One partial-agg shuffle for the
    * per-stratum masses; the |strata|-row rate table broadcasts; the
    * replica explosion is map-side. Strata absent from `weights` get
    * rate 0 and drop out.
    */
  def mixtureSchedule(docs: DataFrame, stratum: Column, tokens: Column,
                      id: Column, weightsPermille: Map[String, Int]): DataFrame = {
    require(weightsPermille.nonEmpty && weightsPermille.values.forall(_ >= 0),
      "weights must be non-negative")
    require(weightsPermille.values.sum == 1000,
      s"weights must sum to 1000 permille, got ${weightsPermille.values.sum}")
    val d = docs.select(id.as("doc_id"), stratum.as("stratum"),
      tokens.cast("long").as("tok"))
    // LAZY localCheckpoint: the |strata|-row aggregate feeds BOTH the
    // rate rows and the grand total, and Catalyst cannot CSE the two
    // subtrees across the crossJoin — without it each reference re-runs
    // the full corpus scan. Lazy (not eager) keeps query builds cheap
    // for the plan gates; the first action materializes bytes.
    val perStratum = d.groupBy(col("stratum")).agg(sum(col("tok")).as("t_s"))
      .trackedCheckpoint(false)
    // T = Σ T_s from the checkpointed aggregate — exact integers, so
    // the sum is identical to a direct full-corpus total
    val grand = perStratum.agg(sum(col("t_s")).as("t_all"))
    val rates = perStratum.crossJoin(broadcast(grand))
      .withColumn("w",
        coalesce(element_at(typedLit(weightsPermille), col("stratum")), lit(0)))
      .select(col("stratum"), expr("w * t_all * 1000 DIV t_s").as("r_ppm"))
    replicate(d, rates)
  }

  /** Temperature-flattened sampling schedule (the mT5 / UniMax
    * multilingual rebalancing rule at τ = 2): stratum weights are
    * proportional to T_s^(1/2) instead of a hand-written recipe, so
    * small languages are oversampled and the head is flattened — the
    * same replica mechanics as [[mixtureSchedule]], with the targets
    * COMPUTED from the data. τ = 2 is chosen deliberately: sqrt is the
    * one power IEEE 754 guarantees correctly rounded, so
    * floor(sqrt(T_s)·1000) is bit-identical on every engine — no pow()
    * last-ulp divergence, and all downstream arithmetic is BIGINT ppm.
    * (Same 2^63 headroom note as [[mixtureSchedule]]: at 100 TB token
    * counts move the rate computation to DECIMAL.)
    */
  def temperatureSchedule(docs: DataFrame, stratum: Column, tokens: Column,
                          id: Column): DataFrame = {
    val d = docs.select(id.as("doc_id"), stratum.as("stratum"),
      tokens.cast("long").as("tok"))
    // lazy-checkpointed like [[mixtureSchedule]]: three consumers (rate
    // rows, T, Σ√) share ONE corpus scan instead of re-running it each
    val perStratum = d.groupBy(col("stratum")).agg(sum(col("tok")).as("t_s"))
      .withColumn("sq",
        floor(sqrt(col("t_s").cast("double")) * 1000).cast("long"))
      .trackedCheckpoint(false)
    val grand = perStratum.agg(sum(col("t_s")).as("t_all"))
    val sumsq = perStratum.agg(sum(col("sq")).as("sumsq"))
    val rates = perStratum
      .crossJoin(broadcast(grand)).crossJoin(broadcast(sumsq))
      .select(col("stratum"),
        expr("sq * t_all * 1000000 DIV (sumsq * t_s)").as("r_ppm"))
    replicate(d, rates)
  }

  /** Shared replica explosion: floor(r_ppm) copies of every doc plus a
    * seeded-hash Bernoulli top-up for the fractional part — map-side
    * after the |strata|-row rate broadcast.
    */
  private def replicate(d: DataFrame, rates: DataFrame): DataFrame =
    d.join(broadcast(rates), Seq("stratum"))
      .withColumn("n_rep", expr("r_ppm DIV 1000000") +
        (pmod(graft.functions.hash60(lit("mix"), col("doc_id")),
          lit(1000000L)) < (col("r_ppm") % 1000000)).cast("long"))
      .filter(col("n_rep") > 0)
      .select(col("doc_id"), col("stratum"),
        explode(sequence(lit(1L), col("n_rep"))).as("rep"))

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val CardRe: String = "\\b\\d{13,19}\\b"

  /** PII redaction: emails → [EMAIL], IPv4 → [IP], 13–19-digit card-like
    * runs → [CARD], applied in that order (emails may embed digits; IPs
    * must be consumed before bare digit runs). Pure regexp projection —
    * stays inside whole-stage codegen, zero shuffle at any scale.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      CardRe, "[CARD]")

  /** Sub-document exact dedup (line/passage-level): slide a `width`-token
    * window `stride` tokens at a time over every doc, group identical
    * passages corpus-wide, keep those present in ≥ `minDocs` distinct
    * docs. The RefinedWeb-style pass that catches boilerplate shared
    * across near-identical documents that whole-doc hashing misses.
    */
  def passageDupes(df: DataFrame, text: Column, id: Column,
                   width: Int = 8, stride: Int = 4,
                   minDocs: Int = 2): DataFrame =
    df.select(id.as("doc_id"), split(text, " ").as("t"))
      .where(size(col("t")) >= width)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          expr(s"(size(t) - $width) DIV $stride").cast("int"))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          slice(col("t"), col("i") * stride + 1, lit(width))).as("passage"))
      .groupBy(col("passage"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** Linear quality-model inference (the FastText-style trained-filter
    * shape): logit = w·(ln tokens, type-token ratio, mean word length) +
    * bias, keep iff logit ≥ 0 (sigmoid is monotone, so the decision
    * needs no exp). Pure projection — batch model scoring at 100 TB is a
    * map-side pass; swapping trained weights in changes nothing
    * structurally.
    */
  def qualityLogit(text: Column,
                   bias: Double = -2.0, wLogTok: Double = 0.8,
                   wTtr: Double = 3.0, wWordLen: Double = -0.5): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val meanLen = (length(text).cast("double") - (nTok - 1)) / nTok
    lit(bias) + lit(wLogTok) * log(nTok) + lit(wTtr) * ttr +
      lit(wWordLen) * meanLen
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis priority sampling): per `bucket`, keep the k
    * rows with smallest priority −ln(u)/w, where u ∈ (0,1] derives from
    * the md5 of `seedCol` — reproducible on any engine, any run, any
    * partitioning. The mixture-sampling move (sample documents ∝ weight
    * per language/domain) as a pure projection + the bounded-heap
    * per-key top-k — no global sort, no RNG state.
    */
  def weightedSample(df: DataFrame, bucket: Column, seedCol: Column,
                     weight: Column, id: Column, k: Int): DataFrame = {
    val u = (graft.functions.hash60(seedCol).cast("double") + 1.0) /
      math.pow(2.0, 60)
    val priority = -log(u) / weight
    Relational.topKPerKey(
      df.withColumn("priority", priority),
      keys = Seq(bucket), order = Seq(col("priority"), id), k = k)
  }

  /** DSIR-style data selection (importance resampling over hashed
    * n-gram features, Xie et al. 2023 shape): each document's importance
    * weight is the log-likelihood ratio of a TARGET unigram LM over the
    * RAW corpus LM, both estimated on a `buckets`-wide hashed vocabulary
    * with add-one smoothing, length-normalized. Rows of the target slice
    * score high; out-of-distribution text scores negative — the
    * "select pretraining data to match a target domain" move.
    *
    * Scale shape: both LMs live in ONE `buckets`-row table (bounded by
    * construction — it broadcasts at any corpus size); scoring is a
    * broadcast join + one integer-sum aggregation per doc. Per-token log
    * ratios are 1e-9-quantized integers, so doc sums are order-proof and
    * the whole weight computation reproduces cross-engine.
    *
    * Returns one row per input doc: (`__id`, n_tok, dsir_weight).
    */
  def dsirWeights(docs: DataFrame, text: Column, id: Column,
                  isTarget: Column, buckets: Int = 1024): DataFrame = {
    // distinct (doc, term) counts FIRST, hash once per pair (not per
    // occurrence), then pin the frame: both the LM estimation and the
    // scoring join read it, and without the checkpoint Spark would run
    // the whole explode+hash chain twice (diamond DAG, no CSE across
    // joins). Steady-state parity at sf0.1 (the host hides it), but the
    // corpus is exploded, hashed, and pre-aggregated ONCE instead of
    // twice — the pass that dominates as the corpus grows.
    val docTerm = docs.select(id.as("__id"), isTarget.as("__t"),
        explode(split(text, " ")).as("__term"))
      .groupBy(col("__id"), col("__t"), col("__term"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__b", pmod(graft.functions.hash60(col("__term")),
        lit(buckets.toLong)))
      .drop("__term")
      .trackedCheckpoint()
    val lm = docTerm.groupBy(col("__b"))
      .agg(sum(col("__n")).as("cr"),
        sum(when(col("__t"), col("__n")).otherwise(0L)).as("ct"))
    val tot = lm.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lw = lm.crossJoin(broadcast(tot)).select(col("__b"),
      round((log((col("ct") + 1).cast("double")
          / (col("nt") + buckets).cast("double"))
        - log((col("cr") + 1).cast("double")
          / (col("nr") + buckets).cast("double"))) * 1e9)
        .cast("long").as("__lw"))
    docTerm.join(broadcast(lw), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("__n")).as("n_tok"),
        sum(col("__n") * col("__lw")).as("__s"))
      .select(col("__id"), col("n_tok"),
        (col("__s") / 1e9 / col("n_tok")).as("dsir_weight"))
  }

  /** Greedy token-budget selection: per `bucket`, keep rows in
    * (`score` desc, `id`) order while the running `tokens` total stays
    * ≤ `budget` — the "best docs until the budget is full" curation move.
    * The running sum rides `Relational.withStratumPrefixSum`, NOT a
    * `Window.partitionBy(bucket)`: bucket is a low-cardinality stratum
    * (language), and real corpora are stratum-skewed — one language is
    * half a web crawl, so the stratum window would funnel half the
    * corpus through one task at scale. The two-pass prefix sum keeps
    * every task range-partition-sized; the sums are exact integers.
    */
  def tokenBudget(df: DataFrame, bucket: String, score: Column, id: Column,
                  tokens: Column, budget: Long): DataFrame =
    graft.operators.Relational.withStratumPrefixSum(df, Seq(bucket),
        Seq(score.desc, id), tokens, as = "cum_tokens")
      .where(col("cum_tokens") <= budget)

  /** CCNet-style boilerplate removal at paragraph granularity: every
    * `w`-token chunk seen verbatim in ≥ `minDocs` DISTINCT docs
    * (headers, footers, nav bars in a real crawl) is dropped from
    * EVERY doc, and the cleaned documents are reassembled in chunk
    * order. One row per input doc: (doc_id, n_chunks, n_kept, cleaned)
    * — fully-boilerplate docs come back with n_kept = 0 and empty
    * text. The boilerplate count shuffles md5 keys, never chunk
    * strings; the rebuild is one groupBy with an array_sort on
    * (chunk_id, text) — per-doc bounded, order-proof.
    */
  /** Non-overlapping `w`-token chunk table of a corpus — the shared
    * "paragraph" construction of [[removeBoilerplate]] and the
    * cross-source contamination matrix (q157): (doc_id, chunk_id,
    * ctext, h) with `h` the chunk's md5 (the key every downstream
    * count/join shuffles instead of the chunk string). The trailing
    * partial chunk is kept.
    */
  def chunkTable(docs: DataFrame, text: Column, id: Column,
                 w: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    docs
      .select(id.as("doc_id"), split(text.cast("string"), " ").as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")), lit(w))).as("start"),
        col("toks"))
      .select(col("doc_id"),
        expr(s"CAST((start - 1) DIV $w AS LONG)").as("chunk_id"),
        array_join(slice(col("toks"), col("start"), lit(w)), " ").as("ctext"))
      .withColumn("h", md5(col("ctext")))
  }

  def removeBoilerplate(docs: DataFrame, text: Column, id: Column,
                        w: Int = 8, minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // LAZY localCheckpoint: three consumers (boilerplate count, kept
    // chunks, per-doc totals) and Catalyst cannot CSE across the
    // joins — without it the explode+md5 pass (and everything
    // upstream, e.g. q161's rule gate) runs three times
    val chunks = chunkTable(docs, text, id, w).trackedCheckpoint(false)
    val boiler = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs).select(col("h"))
    val kept = chunks.join(boiler, Seq("h"), "left_anti")
    chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(
        kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("__k"),
            array_join(transform(
              array_sort(collect_list(struct(col("chunk_id"), col("ctext")))),
              x => x.getField("ctext")), " ").as("__c")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("__k"), lit(0L)).as("n_kept"),
        coalesce(col("__c"), lit("")).as("cleaned"))
  }

  /** Surgical span-level decontamination: instead of DROPPING a training
    * document that shares w-token windows with the eval suite
    * ([[ngramOverlap]]'s verdict), remove ONLY the contaminated token
    * spans and rebuild the document — the modern pipeline posture
    * (whole-doc drops throw away megabytes over one quoted benchmark
    * question). A train token is removed iff it lies inside any w-token
    * window whose content occurs verbatim in an eval document;
    * overlapping windows coalesce naturally through the position union.
    *
    * Returns one row per TRAIN document: (doc_id, total_tokens,
    * removed_tokens, clean_text) — clean_text is the original token
    * sequence with removed positions deleted (order preserved), "" when
    * everything was contaminated.
    *
    * Scale (100 TB): the window pass is the fused q144 generator
    * (positions + 60-bit hashes, never gram strings); the eval side
    * contributes a distinct hash set (eval suites are tiny vs the
    * corpus, so the semi-join broadcasts under AQE). The only
    * corpus-sized shuffle is (doc_id, pos) longs for contaminated
    * windows; the rebuild joins the per-doc sorted start list back to
    * the train scan on doc_id — hit lists are bounded by contamination
    * volume, so AQE broadcasts them and the full text column never
    * shuffles. The per-token keep test is O(spans-in-doc) inside one
    * codegen'd projection.
    */
  def spanDecontaminate(train: DataFrame, eval: DataFrame, text: Column,
                        id: Column, w: Int = 8): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    def wins(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ bridge.column(graft.expressions.WindowHashExplode(
        bridge.expression(text.cast("string")), w)).as(Seq("pos", "gh")): _*)
    val evalSet = wins(eval).select(col("gh")).dropDuplicates("gh")
    val hits = wins(train, id.as("doc_id"))
      .join(evalSet, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val starts = hits.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__s"))
    train.select(id.as("doc_id"), split(text.cast("string"), " ").as("__t"))
      .join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__t"),
        coalesce(col("__s"), array().cast("array<int>")).as("__s"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("total_tokens"),
        filter(col("__t"), (_, i) =>
          !exists(col("__s"), s => s <= i && i < s + w)).as("__k"))
      .select(col("doc_id"), col("total_tokens"),
        (col("total_tokens") - size(col("__k"))).cast("long")
          .as("removed_tokens"),
        array_join(col("__k"), " ").as("clean_text"))
  }

  /** Gopher-style rule battery (Rae et al. 2021, appendix A1.1's
    * repetition-and-length filters, adapted to this corpus): per
    * document, the named signals plus one boolean per rule and the
    * conjunction. Unlike [[qualityLogit]]'s soft score, these are the
    * HARD per-rule gates a crawl pipeline reports individually (so an
    * ablation can toggle one rule at a time). The corpus is
    * all-alphabetic, so Gopher's symbol-ratio and alpha-word rules are
    * degenerate here and the battery keeps the four signals that vary:
    * word count, mean word length, distinct-stopword presence, and
    * duplicate-token fraction.
    *
    * Scale/determinism: one tokenize per document feeding all four
    * signals — a pure projection, zero shuffle at any corpus size.
    * Rule comparisons run on UNROUNDED doubles: each is an exact-long
    * division computed identically in both engines, so the booleans
    * agree; the reported signal columns round at 6 dp for the hash
    * gate.
    */
  def gopherRules(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val meanLen = sumLen.cast("double") / nTok.cast("double")
    val enStops = graft.expressions.StopwordScores.langs.toMap.apply("en")
    val nStop = size(array_intersect(array_distinct(toks),
      array(enStops.map(lit): _*))).cast("long")
    val dupFrac = lit(1.0) -
      size(array_distinct(toks)).cast("double") / nTok.cast("double")
    struct(
      nTok.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      nStop.as("n_stop_distinct"),
      round(dupFrac, 6).as("dup_tok_frac"),
      (nTok >= 40 && nTok <= 100000).as("r_words"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("r_mean_len"),
      (nStop >= 2L).as("r_stop"),
      (dupFrac <= lit(0.5)).as("r_rep"),
      (nTok >= 40 && nTok <= 100000 && meanLen >= 3.0 && meanLen <= 10.0
        && nStop >= 2L && dupFrac <= lit(0.5)).as("pass"))
  }

  /** DoReMi-lite domain reweighting (Xie et al., "Doremi: Optimizing
    * data mixtures speeds up language model pretraining", 2023 — the
    * one-step exponentiated-gradient shape, with the proxy model's
    * per-domain excess loss stood in by the engine's deterministic
    * quality logit): domains whose mean quality trails the corpus mean
    * get upweighted over their token-share reference,
    * `w_d ∝ share_d · exp(η · excess_d)`, normalized to ppm.
    *
    * Determinism discipline (the mixture feeds training, so two runs
    * must agree bit-for-bit): per-domain logit means come from
    * 1e-6-quantized INTEGER sums (order-independent, the kmeans rule);
    * the reference share is a ratio of exact longs; excess rounds at
    * 6 dp before `exp`; and the final normalization is integer ppm
    * division over 1e-9-quantized weights — no float sum whose order
    * could flip an output digit.
    *
    * Scale: one partial-agg shuffle over the corpus to |domains| rows;
    * everything after runs on broadcast-sized aggregates.
    */
  def doremiWeights(docs: DataFrame, domain: Column, tokens: Column,
                    logit: Column, eta: Double = 1.0): DataFrame = {
    val d = docs.select(domain.as("source"), tokens.cast("long").as("tok"),
      round(logit * lit(1e6)).cast("long").as("qli"))
    // LAZY localCheckpoint (the mixtureSchedule pattern): the |domains|-row
    // aggregate feeds both the grand totals and the weight rows, and
    // Catalyst cannot CSE across the crossJoin — without the pin, each
    // reference re-runs the corpus scan+agg.
    val per = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"),
      sum(col("qli")).as("sql_i"))
      .trackedCheckpoint(false)
    val tot = per.agg(sum(col("n_docs")).as("n_g"),
      sum(col("tokens")).as("tok_g"), sum(col("sql_i")).as("sql_g"))
    val meanD = (col("sql_i").cast("double") / lit(1e6)) / col("n_docs").cast("double")
    val meanG = (col("sql_g").cast("double") / lit(1e6)) / col("n_g").cast("double")
    // same two-consumer pin for the weight rows (normalizer + output)
    val weighted = per.crossJoin(broadcast(tot))
      .withColumn("excess", greatest(lit(0.0), round(meanG - meanD, 6)))
      .withColumn("ref_ppm", expr("tokens * 1000000 DIV tok_g"))
      .withColumn("wq", round(
        (col("tokens").cast("double") / col("tok_g").cast("double")) *
          exp(lit(eta) * col("excess")) * lit(1e9)).cast("long"))
      .trackedCheckpoint(false)
    val wqSum = weighted.agg(sum(col("wq")).as("wq_g"))
    weighted.crossJoin(broadcast(wqSum))
      .select(col("source"), col("n_docs"), col("tokens"), col("ref_ppm"),
        col("excess"), expr("wq * 1000000 DIV wq_g").as("weight_ppm"))
  }

  /** Curation run diff — the dataset-versioning primitive: given two
    * gate verdicts over the SAME corpus (config A = what shipped, config
    * B = the proposed change), report per (source, transition) how many
    * documents and tokens move. Transitions: `kept_both`, `dropped_both`,
    * `entered` (B admits what A dropped), `left` (B drops what A kept) —
    * the exact accounting a curation review needs before promoting a
    * config ("this threshold change trades 1.2 B tokens of X for 0.8 B
    * of Y"), without materializing either output corpus.
    *
    * Scale: the transition label is a per-row map-side CASE over two
    * booleans computed in the same projection; the only exchange is the
    * partial-agg rollup to |sources|×4 rows. Nothing corpus-sized ever
    * shuffles, so the diff costs one scan at any corpus size — the
    * alternative (materialize both runs, FULL OUTER JOIN on doc id)
    * shuffles the corpus twice.
    */
  def curationDiff(docs: DataFrame, group: Column, tokens: Column,
                   passA: Column, passB: Column): DataFrame =
    docs.select(group.as("grp"), tokens.cast("long").as("tok"),
        when(passA && passB, "kept_both")
          .when(!passA && !passB, "dropped_both")
          .when(!passA && passB, "entered")
          .otherwise("left").as("transition"))
      .groupBy(col("grp"), col("transition"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
}
