package graft.queries

import graft.Engine
import graft.operators.{Dedup, MinHashUnion}
import graft.functions.{c_round => round}
import graft.{functions => gf}
import org.apache.spark.sql.functions._

/** Deduplication coverage over `documents`: exact hash, MinHash-LSH,
  * SimHash, n-gram Jaccard (SURVEY.md north-star operators).
  *
  * Oracle SQL is generated programmatically where the operator has many
  * regular terms (16 minhash signatures, 32 simhash bit votes) so the SQL
  * provably mirrors the Scala construction.
  */
object DedupQueries {

  import OracleSql.sqlHash60

  /** DuckDB distinct word 3-shingles of column `c` (mirrors
    * Dedup.shingles).
    */
  private[queries] def sqlShinglesOf(c: String): String =
    s"""list_distinct(list_transform(
         generate_series(0, greatest(len(string_split($c, ' ')) - 3, 0)),
         i -> concat_ws(' ', string_split($c, ' ')[i+1],
                        string_split($c, ' ')[i+2],
                        string_split($c, ' ')[i+3])))"""

  /** DuckDB distinct word 3-shingles of `text`. */
  private[queries] val sqlShingles = sqlShinglesOf("text")

  /** DuckDB replay of Dedup.simHash(32) over `documents` — CTEs ending
    * in `sh(doc_id, simhash)`, shared by q35 and the q164 banded join.
    */
  private lazy val sqlSimhashCtes: String = {
    val votes = (0 until 32).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n            ")
    val bits = (0 until 32).map(b =>
      s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""toks AS (
          SELECT doc_id, ${sqlHash60("t")} AS h
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)),
        votes AS (
          SELECT doc_id,
            $votes
          FROM toks GROUP BY doc_id),
        sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM votes)"""
  }

  private val K = 16
  private val Bands = 4
  private val R = K / Bands

  /** LSH band-key construction for a `documents` subset as DuckDB CTEs
    * (`{p}sh` → `{p}sigs` → `{p}bands`), mirroring `Dedup.lshBandKeys`.
    * Kirsch–Mitzenmacher: h1 = md5 hex[1..15], h2 = md5 hex[16..29],
    * hash function s = h1 + s*h2 (mirrors Dedup.minHashSignatures).
    */
  private[queries] def bandCtes(pred: String, p: String): String = {
    val sigCols = (0 until K).map(s =>
      s"min(h1 + $s * h2) AS sig$s").mkString(",\n            ")
    val bandSelects = (0 until Bands).map { b =>
      val parts = (0 until R).map(i => s"sig${b * R + i}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS sig FROM ${p}sigs"
    }.mkString("\n          UNION ALL\n          ")
    s"""${p}sh AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h1,
                 CAST('0x' || substr(md5(sh), 16, 14) AS BIGINT) AS h2
          FROM (SELECT doc_id, unnest($sqlShingles) AS sh
                FROM documents WHERE $pred)),
        ${p}sigs AS (
          SELECT doc_id,
            $sigCols
          FROM ${p}sh GROUP BY doc_id),
        ${p}bands AS (
          $bandSelects)"""
  }

  /** The MinHash-LSH candidate-pair construction as DuckDB CTEs (shared
    * by the q34 oracle and q57's recursive-closure oracle).
    */
  private def lshPairCtes: String =
    s"""${bandCtes("TRUE", "")},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig
                      AND a.doc_id < b.doc_id)"""

  val defs: Seq[(String, QueryDef)] = Seq(

    // Edit-distance near-dup (the record-linkage shape: typo'd variants
    // reconciled to canonical strings): CHARACTER-level verification,
    // complementing token-set PPJoin (q136) and shingle MinHash (q34).
    // Variants get one hash-positioned substitution typo; blocking on
    // (2-char prefix, ±1 length band) bounds candidates — the classic
    // trade: each side shuffles once on the tiny block key, candidate
    // pairs per block stay small, and the O(len²) levenshtein verify
    // runs only inside blocks, never all-pairs. Both engines ship the
    // identical unit-cost DP, so the verdict is bit-stable.
    "q188_editdist_neardup" -> QueryDef(
      build = (s, dir) => {
        val part = Engine.table(s, dir, "part")
        val names = part.select(col("p_partkey").as("nid"),
          col("p_name").as("name"))
        // substitution typo at a hash-chosen position ≥3 (blocking uses
        // the 2-char prefix, which the typo must never touch)
        val pos = (lit(3) + pmod(gf.hash60(col("p_name")),
          greatest(length(col("p_name")) - 2, lit(1)))).cast("int")
        val variants = part.filter(col("p_partkey") % 3 === 0)
          .select(col("p_partkey").as("vid"),
            concat(col("p_name").substr(lit(1), pos - 1), lit("#"),
              col("p_name").substr(pos + 1, length(col("p_name")))).as("variant"))
        // the length band is part of the EQUI-JOIN key (names explode to
        // band ±1), so blocks are (prefix × band), not prefix alone — at
        // corpus scale a coarse prefix block grows quadratically in
        // candidates; the band key splits it ~10× for one 3× row copy
        val vb = variants
          .withColumn("pfx", substring(col("variant"), 1, 2))
          .withColumn("lb", (length(col("variant")) / 4).cast("int"))
        val nb = names
          .withColumn("pfx", substring(col("name"), 1, 2))
          .withColumn("lbn", (length(col("name")) / 4).cast("int"))
          .withColumn("lb", explode(array(col("lbn") - 1, col("lbn"),
            col("lbn") + 1)))
        val cand = vb.join(nb, Seq("pfx", "lb"))
          .withColumn("dist", levenshtein(col("variant"), col("name")))
          .filter(col("dist") <= 2)
        cand.groupBy(col("vid"), col("variant"))
          .agg(min(struct(col("dist"), col("name"))).as("best"))
          .select(col("vid"), col("variant"),
            col("best.name").as("matched"),
            col("best.dist").cast("int").as("dist"))
      },
      oracle = Some(s"""
        WITH names AS (SELECT p_partkey AS nid, p_name AS name FROM part),
        pos AS (
          SELECT p_partkey AS vid, p_name,
                 CAST(3 + ${sqlHash60("p_name")} %
                   greatest(length(p_name) - 2, 1) AS INT) AS p
          FROM part WHERE p_partkey % 3 = 0),
        variants AS (
          SELECT vid, concat(substr(p_name, 1, p - 1), '#',
                 substr(p_name, p + 1)) AS variant
          FROM pos),
        vb AS (SELECT vid, variant, substr(variant, 1, 2) AS pfx,
                      CAST(length(variant) // 4 AS INT) AS lb FROM variants),
        nb AS (SELECT nid, name, substr(name, 1, 2) AS pfx,
                      CAST(length(name) // 4 AS INT) + d.d AS lb
               FROM names, (SELECT unnest([-1, 0, 1]) AS d) AS d),
        cand AS (
          SELECT vid, variant, name,
                 levenshtein(variant, name) AS dist
          FROM vb JOIN nb USING (pfx, lb)
          WHERE levenshtein(variant, name) <= 2)
        SELECT vid, variant,
               min({'dist': dist, 'name': name}).name AS matched,
               CAST(min({'dist': dist, 'name': name}).dist AS INT) AS dist
        FROM cand GROUP BY vid, variant"""),
      headline = false),

    // Exact dedup: hash-groupBy, min-id representative.
    "q32_dedup_exact" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        Dedup.exact(d, col("text"), col("doc_id"))
      },
      oracle = Some("""
        SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)"""),
      headline = true),

    // Exact n-gram Jaccard on a bounded subset (the within-bucket
    // verification path; LSH below is the full-corpus path).
    "q33_ngram_jaccard" -> QueryDef(
      build = (s, dir) => {
        // Synthetic word-soup docs share few 3-shingles; an intersecting
        // pair sits near jaccard ≈ 1/(na+nb) ≈ 0.006, so the demo
        // threshold is low. Real corpora would use ~0.8.
        val d = Engine.table(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0)
        Dedup.ngramJaccardPairs(d, col("text"), col("doc_id"),
          w = 3, minJaccard = 0.005)
      },
      oracle = Some(s"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        sh AS (SELECT doc_id, unnest($sqlShingles) AS s FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.005""")),

    // MinHash-LSH candidate pairs: k=16 md5-derived signatures, 4 bands
    // of 4 — the 100 TB near-dup path (equi-join on band signature).
    "q34_minhash_lsh" -> QueryDef(
      build = (s, dir) => {
        // fanOut: the signature pass is expression-bound (one md5 + k mins
        // per shingle) and the single-row-group scan would pin it to one
        // task — spread it across the cores first (Engine.fanOut).
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        Dedup.minHashLshPairs(d, col("text"), col("doc_id"),
          k = K, bands = Bands, w = 3)
      },
      oracle = Some(s"""
        WITH $lshPairCtes
        SELECT id_a, id_b FROM pairs"""),
      headline = true),

    // Duplicate clusters: connected components over the LSH candidate
    // pairs (Dedup.dupClusters — iterative min-label propagation; the
    // oracle computes the same components via recursive transitive
    // closure, an independent construction).
    "q57_dup_clusters" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        val pairs = Dedup.minHashLshPairs(d, col("text"), col("doc_id"),
          k = K, bands = Bands, w = 3)
        Dedup.dupClusters(pairs).withColumnRenamed("id", "doc_id")
      },
      oracle = Some(s"""
        WITH RECURSIVE $lshPairCtes,
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
        FROM reach GROUP BY a""")),

    // q57's clusters via alternating large-star/small-star contraction
    // (Kiveris et al. 2014) instead of min-label propagation: O(log
    // diameter) rounds instead of O(diameter) — the difference between
    // 5 and 500 shuffles when template spam chains near-dups at 100 TB.
    // Same edges, same oracle as q57: connected components are unique
    // whatever the algorithm, so a green hash here IS the cross-
    // algorithm equivalence proof (the OperatorsSpec law pins it on
    // adversarial chain graphs too).
    //
    // Bench-reading note: at sf0.1 the LSH graph is ~14k edges with
    // tiny-diameter components, so the wall time here is per-round
    // scheduler/shuffle FIXED cost (propagation measures the same ~5s
    // on the same graph) — the number to watch at scale is rounds ×
    // shuffles-per-round, where contraction's log bound wins.
    "q139_cc_star_contraction" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        val pairs = Dedup.minHashLshPairs(d, col("text"), col("doc_id"),
          k = K, bands = Bands, w = 3)
        Dedup.dupClustersAlternating(pairs).withColumnRenamed("id", "doc_id")
      },
      oracle = Some(s"""
        WITH RECURSIVE $lshPairCtes,
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
        FROM reach GROUP BY a"""),
      headline = true),

    // Dedup policy: keep the best document per duplicate cluster
    // (longest wins, id breaks ties) — the decision step that turns q57's
    // clusters into an actual drop list. The representative is picked
    // with max_by over a packed ordering key (n_chars major, negated id
    // minor), which stays on the partial-agg path — no window sort over
    // the cluster members. The oracle recomputes the clusters via an
    // independent recursive closure, then ranks members in SQL.
    "q75_cluster_keep_best" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        val pairs = Dedup.minHashLshPairs(d, col("text"), col("doc_id"),
          k = K, bands = Bands, w = 3)
        val clusters = Dedup.dupClusters(pairs)
        clusters.join(d.select(col("doc_id"), col("n_chars")),
            clusters("id") === col("doc_id"))
          .groupBy(col("cluster_rep"))
          .agg(max_by(col("doc_id"),
            col("n_chars") * lit(1L << 40) - col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_members"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $lshPairCtes,
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        comp AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
          FROM reach GROUP BY a),
        ranked AS (
          SELECT c.cluster_rep, c.doc_id,
                 row_number() OVER (PARTITION BY c.cluster_rep
                   ORDER BY d.n_chars DESC, c.doc_id) AS rn
          FROM comp c JOIN documents d USING (doc_id))
        SELECT cluster_rep, max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
               count(*) AS n_members
        FROM ranked GROUP BY cluster_rep""")),

    // Dedup survival funnel: one summary row counting the corpus at each
    // pipeline stage — total docs, exact-unique texts, docs implicated in
    // near-dup candidate pairs, and distinct near-dup clusters. The
    // monitoring query a 100 TB ingest run emits per batch; every count
    // is a full-pipeline aggregate that reuses the LSH machinery.
    "q86_dedup_funnel" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        val pairs = Dedup.minHashLshPairs(d, col("text"), col("doc_id"),
          k = K, bands = Bands, w = 3)
        val clusters = Dedup.dupClusters(pairs)
        val base = Engine.table(s, dir, "documents")
          .agg(count(lit(1)).as("n_total"),
            countDistinct(md5(col("text"))).as("n_unique_exact"))
        val near = clusters.agg(
          count(lit(1)).as("n_neardup_docs"),
          countDistinct(col("cluster_rep")).as("n_clusters"))
        base.crossJoin(near)
      },
      oracle = Some(s"""
        WITH RECURSIVE $lshPairCtes,
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        comp AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
          FROM reach GROUP BY a)
        SELECT (SELECT count(*) FROM documents) AS n_total,
               (SELECT count(DISTINCT md5(text)) FROM documents)
                 AS n_unique_exact,
               (SELECT count(*) FROM comp) AS n_neardup_docs,
               (SELECT count(DISTINCT cluster_rep) FROM comp) AS n_clusters""")),

    // SimHash (32-bit): per-token ±1 bit votes.
    "q35_simhash" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        Dedup.simHash(d, col("text"), col("doc_id"), nBits = 32)
          .withColumnRenamed("__id", "doc_id")
      },
      oracle = Some(s"""
        WITH $sqlSimhashCtes
        SELECT doc_id, simhash FROM sh"""),
      headline = true),

    // SimHash banded near-dup JOIN (Manku/Charikar web-dedup): 32-bit
    // signatures split into 4 bands of 8 bits; docs sharing any band
    // value become candidates, verified at hamming <= 3. EXACT by
    // pigeonhole — 3 differing bits touch at most 3 bands, so every
    // qualifying pair shares at least one intact band; the band join
    // is an equi-join on (band, value) whose fan-out is bucket
    // occupancy, never all-pairs, and the carried state per row is one
    // 8-byte signature.
    "q164_simhash_neardup" -> QueryDef(
      build = (s, dir) => {
        // fanOut: one md5 per shingle in the signature pass (the q34
        // minhash rationale; A/B'd r18)
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        Dedup.simHashNearDupPairs(
          Dedup.simHash(d, col("text"), col("doc_id"), nBits = 32),
          id = "__id", sig = "simhash")
      },
      oracle = Some(s"""
        WITH $sqlSimhashCtes,
        b AS (
          SELECT doc_id, simhash,
                 unnest(generate_series(0, 3)) AS band
          FROM sh),
        bv AS (SELECT doc_id, simhash, band,
                      (simhash >> (band * 8)) & 255 AS v FROM b),
        pairs AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                 x.simhash AS sa, y.simhash AS sb
          FROM bv x JOIN bv y
            ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id)
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM pairs WHERE bit_count(xor(sa, sb)) <= 3"""),
      headline = true),

    // Mergeable signature union (typed Aggregator, SURVEY §2.10): the
    // per-source corpus signature is the element-wise min of the per-doc
    // MinHash signatures — MinHashUnion folds it with fixed k-long state
    // on the partial-agg path. The oracle exploits the sketch's defining
    // law: the union signature equals the signature of the union of the
    // shingle sets, so DuckDB computes min(h1+s·h2) straight off the
    // pooled shingles — an independent construction of the same value.
    "q125_source_signature" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        // signatures are a pure per-row projection, so keying them by
        // `source` directly avoids any join-back
        val sigs = Dedup.minHashSignatures(d, col("text"), col("source"),
          k = K, w = 3)
        val sigArr = array((0 until K).map(i => col(s"sig$i")): _*)
        sigs.groupBy(col("__id").as("source"))
          .agg(MinHashUnion(sigArr).as("usig"),
            count(lit(1)).as("n_docs"))
          .select(col("source") +: col("n_docs") +:
            (0 until K).map(i => element_at(col("usig"), i + 1).as(s"sig$i")): _*)
      },
      oracle = Some {
        val sigCols = (0 until K).map(s =>
          s"min(h1 + $s * h2) AS sig$s").mkString(",\n            ")
        s"""
        WITH sh AS (
          SELECT source,
                 CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h1,
                 CAST('0x' || substr(md5(sh), 16, 14) AS BIGINT) AS h2
          FROM (SELECT source, unnest($sqlShingles) AS sh FROM documents)),
        usig AS (
          SELECT source,
            $sigCols
          FROM sh GROUP BY source),
        n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        SELECT source, n_docs, ${(0 until K).map(i => s"sig$i").mkString(", ")}
        FROM usig JOIN n USING (source)"""
      }),

    // Incremental cross-batch dedup gate (Dedup.incrementalLshSurvivors):
    // docs with doc_id%4=0 play the already-ingested corpus; the rest are
    // the arriving batch, and survive only if NONE of their band
    // signatures collides with the history's band-key store — the J5
    // dedup gate lifted to near-dup, the continuous-ingest discipline at
    // 100 TB (the store is append-only and bucketed by (band, sig)).
    "q126_incremental_dedup" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
        val history = d.filter(col("doc_id") % 4 === 0)
        val incoming = d.filter(col("doc_id") % 4 =!= 0)
        Dedup.incrementalLshSurvivors(incoming, history,
            col("text"), col("doc_id"), k = K, bands = Bands, w = 3)
          .select(col("__id").as("doc_id"))
      },
      oracle = Some(s"""
        WITH ${bandCtes("doc_id % 4 = 0", "h")},
        ${bandCtes("doc_id % 4 <> 0", "i")},
        collided AS (
          SELECT DISTINCT i.doc_id
          FROM ibands i JOIN hbands h ON i.band = h.band AND i.sig = h.sig)
        SELECT doc_id FROM documents
        WHERE doc_id % 4 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM collided)""")),

    // Fuzzy entity matching: all part pairs whose (name + type) token
    // sets agree at Jaccard >= 0.7 — the entity-resolution join, via the
    // EXACT prefix-filtered set-similarity join (candidates only from
    // each entity's globally-rarest tokens; hot tokens never pair). The
    // oracle is deliberately the BRUTE-FORCE all-pairs Jaccard, so a
    // green hash proves the prefix cut lossless, not just fast.
    "q136_fuzzy_entity_match" -> QueryDef(
      build = (s, dir) => {
        val p = Engine.table(s, dir, "part")
        graft.operators.Relational.similaritySelfJoin(p,
          concat_ws(" ", col("p_name"), col("p_type")), col("p_partkey"),
          tau = 0.7)
      },
      oracle = Some("""
        WITH p AS (
          SELECT p_partkey,
                 list_distinct(string_split(lower(p_name || ' ' || p_type),
                   ' ')) AS w
          FROM part),
        pairs AS (
          SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                 len(list_intersect(a.w, b.w)) AS n_shared,
                 len(list_distinct(list_concat(a.w, b.w))) AS u
          FROM p a JOIN p b ON a.p_partkey < b.p_partkey)
        SELECT key_a, key_b, CAST(n_shared AS BIGINT) AS n_shared,
               round(CAST(n_shared AS DOUBLE) / u, 6) AS jaccard
        FROM pairs WHERE CAST(n_shared AS DOUBLE) / u >= 0.7"""),
      headline = true),

    // Exact substring dedup (Lee et al. 2022 ExactSubstr): positional
    // 8-token windows occurring verbatim in >= 2 distinct documents,
    // coalesced into maximal per-doc spans. Position-aware — finds the
    // repeated PASSAGE, not just set overlap — so it is the per-token
    // removal mask a training pipeline actually applies. The oracle
    // replays the identical md5-hash window table, duplicate-hash set,
    // and interval coalescing.
    "q144_substring_dedup" -> QueryDef(
      // NO fanOut (A/B'd r18: +13% over run noise WITH it — the fused
      // WindowHashExplode feeds a trackedCheckpoint whose downstream
      // consumers reshuffle anyway, so the extra exchange buys nothing)
      build = (s, dir) => Dedup.substringDupStats(
        Engine.table(s, dir, "documents"), col("text"), col("doc_id"), w = 8),
      headline = true,
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        wins AS (
          SELECT doc_id, pos,
                 ${sqlHash60("array_to_string(t[pos+1:pos+8], ' ')")} AS gh
          FROM (SELECT doc_id, t,
                       unnest(generate_series(0, len(t) - 8)) AS pos
                FROM toks WHERE len(t) >= 8)),
        dup AS (
          SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM wins)
          GROUP BY gh HAVING count(*) >= 2),
        covered AS (
          SELECT DISTINCT w.doc_id, w.pos + k.k AS idx
          FROM wins w JOIN dup USING (gh),
               LATERAL (SELECT unnest(generate_series(0, 7)) AS k) k),
        marked AS (
          SELECT doc_id, idx,
                 CASE WHEN lag(idx) OVER (PARTITION BY doc_id ORDER BY idx)
                      IS DISTINCT FROM idx - 1 THEN 1 ELSE 0 END AS st
          FROM covered),
        spans AS (
          SELECT doc_id, count(*) AS dup_tokens, sum(st) AS n_spans
          FROM marked GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS total_tokens,
               CAST(coalesce(s.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans
        FROM toks t LEFT JOIN spans s USING (doc_id)""")),

    // Dedup-loss ATTRIBUTION: when global exact dedup keeps the min-id
    // copy, how much does each SOURCE lose — the per-provider report
    // that explains "why did my share shrink" after a dedup pass and
    // flags mirror-heavy feeds. One content-hash partial agg for the
    // keeper, a map-side keeper test, one source rollup; exact counts,
    // one division.
    "q170_dedup_attribution" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val keepers = d.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("keep_id"))
        d.select(col("doc_id"), col("source"), md5(col("text")).as("__h"))
          .join(keepers, Seq("__h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum((col("doc_id") =!= col("keep_id")).cast("long"))
              .as("n_removed"))
          .select(col("source"), col("n_docs"), col("n_removed"),
            round(col("n_removed").cast("double") / col("n_docs"), 6)
              .as("removal_rate"))
      },
      oracle = Some("""
        WITH k AS (
          SELECT md5(text) AS h, min(doc_id) AS keep_id
          FROM documents GROUP BY 1)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN doc_id != keep_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_removed,
               round(CAST(sum(CASE WHEN doc_id != keep_id THEN 1 ELSE 0
                 END) AS DOUBLE) / count(*), 6) AS removal_rate
        FROM documents JOIN k ON md5(text) = k.h
        GROUP BY source""")),

    // Cross-source contamination matrix: for every source pair, how
    // many distinct 8-token passages they share verbatim — the
    // provenance diagnostic that catches one crawl mirroring another
    // (shared boilerplate, syndicated content) before mixture weights
    // are set. The self-join runs on (passage-hash, source) DISTINCT
    // rows, so per-hash fan-out is bounded by |sources| (≤ |sources|²
    // pairs per hash) — never by document count; the shuffle carries
    // md5 keys, never passage text.
    "q157_source_overlap" -> QueryDef(
      build = (s, dir) => {
        // NO fanOut (measured 0.42s -> 0.76s with it: one md5 per 8
        // tokens is too cheap to pay an exchange for); chunkTable is
        // the SAME construction q155/q161 clean with, keyed by source
        val d = Engine.table(s, dir, "documents")
        val chunks = graft.operators.Curation
          .chunkTable(d, col("text"), col("source"), w = 8)
          .select(col("doc_id").as("source"), col("h"))
          .distinct()
        chunks.withColumnRenamed("source", "src_a")
          .join(chunks.withColumnRenamed("source", "src_b"), Seq("h"))
          .where(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_shared"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT DISTINCT source,
                 md5(array_to_string(
                   string_split(text, ' ')[start : start + 7], ' ')) AS h
          FROM (SELECT source, text,
                       unnest(generate_series(1,
                         len(string_split(text, ' ')), 8)) AS start
                FROM documents))
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2""")),

    // LSH banding-parameter audit: on the q33 bounded sample, measure
    // each band config's candidate volume, precision, and recall
    // against the exact Jaccard >= 0.005 truth — the tuning pass run
    // BEFORE committing (k, bands) for the full-corpus q34 join. The
    // oracle replays all three banded joins and the exact truth from
    // the same signature CTEs.
    "q171_lsh_tuning_audit" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.fanOut(Engine.table(s, dir, "documents"))
          .filter(col("doc_id") % 5 === 0)
        graft.operators.Dedup.lshTuningAudit(d, col("text"), col("doc_id"),
          k = K, bandsList = Seq(2, 4, 8), w = 3, tau = 0.005)
      },
      oracle = Some(s"""
        WITH ash AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h1,
                 CAST('0x' || substr(md5(sh), 16, 14) AS BIGINT) AS h2
          FROM (SELECT doc_id, unnest($sqlShingles) AS sh
                FROM documents WHERE doc_id % 5 = 0)),
        asigs AS (
          SELECT doc_id,
            ${(0 until K).map(s => s"min(h1 + $s * h2) AS sig$s")
              .mkString(",\n            ")}
          FROM ash GROUP BY doc_id),
        ${Seq(2, 4, 8).map(b => s"b$b AS (\n          ${bandSelectsFor(b)})")
          .mkString(",\n        ")},
        cand AS (
          ${Seq(2, 4, 8).map(b =>
            s"""SELECT DISTINCT $b AS bands, a.doc_id AS id_a, b.doc_id AS id_b
          FROM b$b a JOIN b$b b ON a.band = b.band AND a.sig = b.sig
                               AND a.doc_id < b.doc_id""")
            .mkString("\n          UNION ALL\n          ")}),
        tsh AS (
          SELECT doc_id, unnest($sqlShingles) AS s
          FROM documents WHERE doc_id % 5 = 0),
        tsizes AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY doc_id),
        tinter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM tsh a JOIN tsh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT id_a, id_b FROM tinter
          JOIN tsizes na ON na.doc_id = id_a
          JOIN tsizes nb ON nb.doc_id = id_b
          WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.005),
        tp AS (
          SELECT bands, count(*) AS n FROM cand
          JOIN truth USING (id_a, id_b) GROUP BY bands),
        nc AS (SELECT bands, count(*) AS n FROM cand GROUP BY bands),
        nt AS (SELECT count(*) AS n FROM truth),
        base AS (SELECT unnest([2, 4, 8]) AS bands)
        SELECT base.bands, nt.n AS n_truth,
               CAST(coalesce(nc.n, 0) AS BIGINT) AS n_candidates,
               CAST(coalesce(tp.n, 0) AS BIGINT) AS n_true_pos,
               CASE WHEN coalesce(nc.n, 0) > 0 THEN
                 round(CAST(coalesce(tp.n, 0) AS DOUBLE) / nc.n, 6)
               END AS "precision",
               CASE WHEN nt.n > 0 THEN
                 round(CAST(coalesce(tp.n, 0) AS DOUBLE) / nt.n, 6)
               END AS recall
        FROM base CROSS JOIN nt
        LEFT JOIN nc USING (bands) LEFT JOIN tp USING (bands)""")),

    // The continuous EXACT-SUBSTRING gate, oracle-backed: two
    // mtimes-ordered deliveries (evens, then odds) stream through
    // substrDupIngest — each batch's docs drop when ≥ tau (50%) of
    // their distinct 8-token window hashes already exist in the
    // PERSISTED store of prior-batch survivors or in a smaller-id doc
    // of the same batch; survivors' hashes then extend the store. The
    // oracle replays the arrival-order semantics with q144's window
    // spelling (hash60 of the space-joined positional window); docs
    // shorter than the window carry no hashes and always survive.
    // Drain ×2 from one checkpoint — the replayed batch excludes its
    // own store partition from the gate, so the rewrite is identical.
    "q211_stream_substr_gate" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val d = Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val dv = new StreamDeliveries("graft_q211_substr")
        val root = dv.root
        def land(df: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = dv.land(df, name, mtime)
        land(d.filter(col("doc_id") % 2 === 0), "a", 1000000000000L)
        land(d.filter(col("doc_id") % 2 === 1), "b", 1000000060000L)
        val store = s"$root/store"; val out = s"$root/out"
        val chk = s"$root/chk"
        def drain(): Unit = {
          val stream = s.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1").parquet(dv.dropDir)
          graft.streaming.StreamOps.substrDupIngest(stream, "text",
            "doc_id", store, out, chk, w = 8, tauPermille = 500,
            trigger = Some(Trigger.AvailableNow())).awaitTermination()
        }
        drain()
        drain() // replay from the same checkpoint: must rewrite nothing
        s.read.parquet(out)
          .select(col("doc_id"), md5(col("text")).as("text_md5"),
            col("batch").cast("int").as("ingest_batch"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        wins AS (
          SELECT DISTINCT doc_id, gh FROM (
            SELECT doc_id,
                   ${sqlHash60("array_to_string(t[pos+1:pos+8], ' ')")} AS gh
            FROM (SELECT doc_id, t,
                         unnest(generate_series(0, len(t) - 8)) AS pos
                  FROM toks WHERE len(t) >= 8))),
        ewins AS (SELECT * FROM wins WHERE doc_id % 2 = 0),
        owins AS (SELECT * FROM wins WHERE doc_id % 2 = 1),
        etot AS (SELECT doc_id, count(*) AS n_w FROM ewins GROUP BY doc_id),
        edup AS (
          SELECT w.doc_id, count(*) AS nd FROM ewins w
          WHERE EXISTS (SELECT 1 FROM ewins w2
                        WHERE w2.gh = w.gh AND w2.doc_id < w.doc_id)
          GROUP BY w.doc_id),
        edropped AS (
          SELECT d.doc_id FROM edup d JOIN etot t USING (doc_id)
          WHERE d.nd * 1000 >= t.n_w * 500),
        esurv AS (
          SELECT doc_id FROM documents WHERE doc_id % 2 = 0
            AND doc_id NOT IN (SELECT doc_id FROM edropped)),
        estore AS (
          SELECT DISTINCT gh FROM ewins
          WHERE doc_id IN (SELECT doc_id FROM esurv)),
        otot AS (SELECT doc_id, count(*) AS n_w FROM owins GROUP BY doc_id),
        odup AS (
          SELECT doc_id, count(*) AS nd FROM (
            SELECT DISTINCT w.doc_id, w.gh FROM owins w
            WHERE w.gh IN (SELECT gh FROM estore)
               OR EXISTS (SELECT 1 FROM owins w2
                          WHERE w2.gh = w.gh AND w2.doc_id < w.doc_id))
          GROUP BY doc_id),
        odropped AS (
          SELECT d.doc_id FROM odup d JOIN otot t USING (doc_id)
          WHERE d.nd * 1000 >= t.n_w * 500),
        osurv AS (
          SELECT doc_id FROM documents WHERE doc_id % 2 = 1
            AND doc_id NOT IN (SELECT doc_id FROM odropped)),
        surv AS (
          SELECT doc_id, 0 AS ingest_batch FROM esurv
          UNION ALL
          SELECT doc_id, 1 AS ingest_batch FROM osurv)
        SELECT s.doc_id, md5(d.text) AS text_md5,
               CAST(s.ingest_batch AS INT) AS ingest_batch
        FROM surv s JOIN documents d ON d.doc_id = s.doc_id""")),

    // The continuous NEAR-DUP ingest, oracle-backed end to end: the
    // corpus arrives as two mtimes-ordered deliveries (evens then odds,
    // maxFilesPerTrigger=1 → separate micro-batches), and each batch of
    // nearDupIngest is (a) gated against the PERSISTED band-key store
    // of all prior batches, (b) within-batch deduped (larger id drops),
    // (c) written out with its survivors' keys appended to the store —
    // so an odd doc survives only if it collides with NO even survivor
    // and no smaller surviving odd. The oracle replays exactly that
    // arrival-order semantics in SQL: batch-1 survivors from
    // within-batch pairs, their DISTINCT band keys as the store, batch
    // 2 gated against it, then its own within-batch pairs. Drain ×2
    // from one checkpoint — nearDupBatch's replayed micro-batch
    // rewrites its own batch=N paths and EXCLUDES its own partition
    // from the gate read, so the second drain changes nothing (the
    // crash-and-replay discipline, proven by the hash gate). The
    // `batch` partition column rides into the output as the ingest
    // batch attribution.
    "q209_stream_neardup_ingest" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val d = Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val dv = new StreamDeliveries("graft_q209_neardup")
        val root = dv.root
        def land(df: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = dv.land(df, name, mtime)
        land(d.filter(col("doc_id") % 2 === 0), "a", 1000000000000L)
        land(d.filter(col("doc_id") % 2 === 1), "b", 1000000060000L)
        val store = s"$root/store"; val out = s"$root/out"
        val chk = s"$root/chk"
        def drain(): Unit = {
          val stream = s.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1").parquet(dv.dropDir)
          graft.streaming.StreamOps.nearDupIngest(stream, "text", "doc_id",
            store, out, chk, k = K, bands = Bands, w = 3,
            trigger = Some(Trigger.AvailableNow())).awaitTermination()
        }
        drain()
        drain() // replay from the same checkpoint: must rewrite nothing
        s.read.parquet(out)
          .select(col("doc_id"), md5(col("text")).as("text_md5"),
            col("batch").cast("int").as("ingest_batch"))
      },
      oracle = Some(s"""
        WITH ${bandCtes("doc_id % 2 = 0", "e")},
        ${bandCtes("doc_id % 2 = 1", "o")},
        epairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM ebands a JOIN ebands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        esurv AS (
          SELECT doc_id FROM documents WHERE doc_id % 2 = 0
            AND doc_id NOT IN (SELECT id_b FROM epairs)),
        ekeys AS (
          SELECT DISTINCT band, sig FROM ebands
          WHERE doc_id IN (SELECT doc_id FROM esurv)),
        ogated AS (
          SELECT doc_id FROM documents WHERE doc_id % 2 = 1
            AND doc_id NOT IN (
              SELECT DISTINCT o.doc_id FROM obands o
              JOIN ekeys k ON k.band = o.band AND k.sig = o.sig)),
        opairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM obands a JOIN obands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
          WHERE a.doc_id IN (SELECT doc_id FROM ogated)
            AND b.doc_id IN (SELECT doc_id FROM ogated)),
        osurv AS (
          SELECT doc_id FROM ogated
          WHERE doc_id NOT IN (SELECT id_b FROM opairs)),
        surv AS (
          SELECT doc_id, 0 AS ingest_batch FROM esurv
          UNION ALL
          SELECT doc_id, 1 AS ingest_batch FROM osurv)
        SELECT s.doc_id, md5(d.text) AS text_md5,
               CAST(s.ingest_batch AS INT) AS ingest_batch
        FROM surv s JOIN documents d ON d.doc_id = s.doc_id""")),

    // STATEFUL streaming dedup, end to end through the real state store
    // (q201 proved the stateless stream lifecycle; this proves state
    // SURVIVES micro-batch boundaries and checkpoint replay): the corpus
    // lands as file A, then file B echoes every even-id document as an
    // exact duplicate row; mtimes force A before B, maxFilesPerTrigger=1
    // forces them into SEPARATE micro-batches, so B's duplicates can
    // only be dropped if batch A's ids are still in the dedup state when
    // batch B runs. StreamOps.dedupStream
    // (dropDuplicatesWithinWatermark) gates them; the drain runs TWICE
    // from one checkpoint (replay must add zero rows). 500 output rows
    // require cross-batch state — a state-losing engine yields 750.
    // Oracle: the original set, one row per document.
    "q203_stream_dedup_gate" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val d = Engine.table(s, dir, "documents")
          .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("text_md5"),
            col("lang"), col("source"), col("n_chars"),
            lit("2026-08-14 00:00:00").cast("timestamp").as("tstamp"))
        val dv = new StreamDeliveries("graft_q203_dedup")
        val root = dv.root
        def land(df: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = dv.land(df, name, mtime)
        land(d, "a", 1000000000000L)
        land(d.filter(col("doc_id") % 2 === 0), "b", 1000000060000L)
        val out = s"$root/out"; val chk = s"$root/chk"
        def drain(): Unit = {
          val events = s.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(dv.dropDir)
          val q = graft.streaming.StreamOps
            .dedupStream(events, Seq("doc_id"), watermark = "10 minutes")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", chk)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        drain()
        drain() // replay from the same checkpoint: must be a no-op
        s.read.parquet(out)
          .select(col("doc_id"), col("text_md5"), col("lang"),
            col("source"), col("n_chars"))
      },
      oracle = Some("""
        SELECT doc_id, md5(coalesce(text, '')) AS text_md5,
               lang, source, n_chars
        FROM documents"""))
  )

  /** The banded-key CTE body for an arbitrary band count over `asigs`
    * (k = K signatures) — the q171 audit's per-config twin of
    * [[bandCtes]]'s fixed-Bands band selects.
    */
  private def bandSelectsFor(bands: Int): String = {
    val r = K / bands
    (0 until bands).map { b =>
      val parts = (0 until r).map(i => s"sig${b * r + i}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS sig FROM asigs"
    }.mkString("\n          UNION ALL\n          ")
  }
}
