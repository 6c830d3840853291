package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import graft.{functions => gf}
import org.apache.spark.sql.expressions.Window
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines, from exact
  * hash-groupBy to MinHash-LSH near-dup detection.
  *
  * Scale design (100 TB): every variant is a bounded number of
  * shuffle-by-key passes — no pairwise O(n²) stage ever materializes over
  * the full corpus. LSH banding turns near-dup search into an equi-join on
  * (band, signature), which Spark executes as a shuffled hash join with
  * AQE skew splitting; only within-bucket candidates are compared.
  * Hashes are md5-based (graft.functions.hash60) so an ANSI-SQL oracle
  * reproduces every signature exactly.
  */
object Dedup {

  /** Exact dedup by content hash: one hash-shuffle, keeps the smallest id
    * per group as representative.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word w-shingles (default w=3) as a distinct array column expression. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - w, lit(0)) ),
      i => concat_ws(" ", (0 until w).map(k => element_at(toks, i + k + 1)): _*)))
  }

  /** MinHash signature columns: Kirsch–Mitzenmacher construction — ONE md5
    * per shingle yields two independent hashes (h1: 60 bits, h2: 56 bits),
    * and hash function s is h1 + s·h2. k md5 evaluations per shingle would
    * dominate the whole LSH pipeline (measured 10s → ~2s at sf0.1 for
    * k=16); the double-hashing family has the same collision behavior for
    * MinHash purposes. Returns one row per id with columns sig0..sig{k-1}.
    *
    * Executes as a PURE PROJECTION: the per-shingle hashes and the k mins
    * are computed inside array expressions (`transform` + `array_min`) on
    * each row — no explode, no exchange. The first shuffle of the whole
    * LSH pipeline is the band self-join, which is the one the semantics
    * actually require. (Replacing the previous explode + groupBy(k mins)
    * formulation: 10M exploded rows and a full shuffle at sf0.1.)
    */
  def minHashSignatures(df: DataFrame, text: Column, id: Column,
                        k: Int = 16, w: Int = 3): DataFrame = {
    require(k <= 16, s"k=$k would overflow h1 + (k-1)*h2 past 2^61")
    if (w == 3) {
      // fused native path: one codegen'd pass per document computes all
      // k mins (graft.expressions.MinHashSigs) — same values
      val sigs = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.MinHashSigs(
          org.apache.spark.sql.graft.ColumnBridge.expression(text.cast("string")), k))
      df.select(id.as("__id"), sigs.as("__sigs"))
        .select(col("__id") +: (0 until k).map(s =>
          element_at(col("__sigs"), s + 1).as(s"sig$s")): _*)
    } else {
      // general-w composed path (array expressions; also the executable
      // spec the fused expression is tested against)
      val hashed = transform(shingles(text, w),
        sh => struct(gf.hash60(sh).as("h1"), gf.hash56b(sh).as("h2")))
      val sigCols = (0 until k).map(s =>
        array_min(transform(col("__hp"),
          p => p.getField("h1") + lit(s.toLong) * p.getField("h2"))).as(s"sig$s"))
      df.select(id.as("__id"), hashed.as("__hp"))
        .select(col("__id") +: sigCols: _*)
    }
  }

  private def groupByAgg(df: DataFrame, key: Column, aggs: Seq[Column]) =
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)

  /** MinHash-LSH candidate pairs: k signatures banded into `bands` bands
    * of k/bands rows; docs sharing any band signature become a candidate
    * pair (id_a < id_b, distinct).
    */
  /** LSH band keys: one (`__id`, band, sig) row per document per band —
    * the bucket membership that every LSH consumer (pair join,
    * incremental gate, persisted signature store) equi-joins on. Each doc
    * emits exactly ONE row per band by construction, so no distinct is
    * needed on the way out.
    */
  def lshBandKeys(df: DataFrame, text: Column, id: Column,
                  k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    val r = k / bands
    val sigs = minHashSignatures(df, text, id, k, w)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (0 until r).map(i => col(s"sig${b * r + i}")): _*))
          .as("sig")).as(s"b$b")
    }
    sigs.select(col("__id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  def minHashLshPairs(df: DataFrame, text: Column, id: Column,
                      k: Int = 16, bands: Int = 4, w: Int = 3): DataFrame = {
    val banded = lshBandKeys(df, text, id, k, bands, w)
    val a = banded.select(col("band"), col("sig"), col("__id").as("id_a"))
    val b = banded.select(col("band"), col("sig"), col("__id").as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
  }

  /** Incremental (cross-batch) near-dup gate — the continuous-ingest form
    * of LSH dedup: a new document is dropped when ANY of its band
    * signatures collides with a band signature already present in the
    * ingested corpus. Returns the surviving incoming ids (column `__id`).
    *
    * This is the J5 dedup-gate shape lifted from exact match to near-dup:
    * membership is decided against the HISTORY's band-key set, not
    * within the batch, so ingest order is respected (history never
    * shrinks) and replays are idempotent.
    *
    * Scale design (100 TB corpus, small ongoing batches): the history's
    * distinct band keys are the persisted "signature store" — at steady
    * state they are written once per batch (append of the batch's own
    * keys) and bucketed by (band, sig), so this semi-join reads
    * co-located buckets and only the incoming batch shuffles. The
    * doc-level verdict is a left_semi + left_anti pair — no pairwise
    * comparison, no window.
    */
  def incrementalLshSurvivors(incoming: DataFrame, history: DataFrame,
                              text: Column, id: Column,
                              k: Int = 16, bands: Int = 4, w: Int = 3,
                              historyIsBandKeys: Boolean = false): DataFrame = {
    // history is either raw documents or an already-materialized
    // (band, sig) key store (the persisted form a continuous ingest keeps)
    val store = (if (historyIsBandKeys) history.select(col("band"), col("sig"))
                 else lshBandKeys(history, text, id, k, bands, w)
                   .select(col("band"), col("sig")))
      .dropDuplicates("band", "sig")
    val collided = lshBandKeys(incoming, text, id, k, bands, w)
      .join(store, Seq("band", "sig"), "left_semi")
      .select(col("__id")).dropDuplicates("__id")
    incoming.select(id.as("__id"))
      .join(collided, Seq("__id"), "left_anti")
  }

  /** Duplicate-cluster assignment — the dedup endgame: connected
    * components over a candidate-pair list (e.g. [[minHashLshPairs]]
    * output), so each near-dup group keeps exactly one representative
    * (the minimum id, transitively: a~b and b~c puts a,b,c in one
    * cluster even if a,c never paired).
    *
    * Iterative min-label propagation: every node starts labeled with its
    * own id; each superstep lowers a node's label to the minimum of its
    * neighbors' labels; fixpoint in ≤ diameter steps. Each superstep is
    * one shuffle-by-key join + partial-agg min — no per-row driver work —
    * and `localCheckpoint` truncates the growing plan lineage (the
    * standard Spark pattern for iterative graph algorithms; GraphX does
    * the same under the hood). At 100 TB the pair list is orders of
    * magnitude smaller than the corpus (only LSH candidates), and dup
    * clusters are shallow — typically 2–4 supersteps.
    *
    * Returns (id, cluster_rep). Only ids appearing in `pairs` are
    * returned; unpaired docs are their own singleton clusters by
    * definition.
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                  maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().trackedCheckpoint()
    var labelsCp = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).trackedCheckpoint()
    var labels = labelsCp
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // carry the old label through the update so the convergence check
      // is a filter over the already-checkpointed result, not another join
      val updated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .trackedCheckpoint()
      val changed = updated.filter(col("label") =!= col("__old")).count()
      // superstep i's blocks are dead once i+1 is materialized
      graft.Checkpoints.drop(labelsCp)
      labelsCp = updated
      labels = updated.select(col("id"), col("label"))
      converged = changed == 0
      iter += 1
    }
    // the result references only the final superstep's checkpoint
    graft.Checkpoints.drop(edges)
    labels.select(col("id"), col("label").as("cluster_rep"))
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the scale-posture alternative to [[dupClusters]]'s
    * min-label propagation. Propagation needs O(component diameter)
    * rounds: a transitive near-dup CHAIN (doc A ~ B ~ C ~ …, the shape
    * template-spam actually produces) of length d costs d rounds, each
    * a full shuffle of the edge set. Star contraction halves component
    * height every two rounds — O(log d) rounds on the same graph, each
    * round two shuffles (a groupBy-min and an equi-join; neighbor lists
    * are never materialized as arrays).
    *
    *  - large-star: every node u links its LARGER neighbors to
    *    m(u) = min(N(u) ∪ {u}) — safe in parallel because edges only
    *    ever point downward toward each component's minimum.
    *  - small-star: every node u re-links its smaller-or-equal
    *    neighbors (and itself) to m(u), collapsing the short chains
    *    large-star leaves behind.
    *
    * Fixpoint is a star per component (every node directly on the
    * component minimum); the final gather is one groupBy-min. Output
    * matches [[dupClusters]] row-for-row — (id, cluster_rep) with rep =
    * component minimum — pinned by the shared q57 oracle and the
    * OperatorsSpec equivalence law.
    */
  def dupClustersAlternating(pairs: DataFrame, idA: String = "id_a",
                             idB: String = "id_b",
                             maxIters: Int = 50,
                             localFinishEdges: Long = 200000L): DataFrame = {
    // canonical undirected storage (a < b); each phase gathers over the
    // both-orientation view so one groupBy(src) sees a full neighborhood
    def canonical(e: DataFrame) = e
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    def bothWays(und: DataFrame) = und
      .select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    // m(u) = min(N(u) ∪ {u}) — one partial-agg shuffle, never an array.
    // (min over ALL neighbors equals the paper's min over smaller ones:
    // any neighbor below u is a "smaller neighbor", and when none exist
    // both reduce to u itself.)
    def mins(both: DataFrame) = both.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
    var und = canonical(pairs.select(col(idA).as("a"), col(idB).as("b")))
      .trackedCheckpoint()
    val nodes = bothWays(und).select(col("src").as("id")).distinct()
      .trackedCheckpoint()
    var nOld = und.count()
    var iter = 0
    var converged = false
    // Hybrid finish (the GraphX/Pregel small-graph escape): each star
    // round costs two materialization jobs, so once the (shrinking)
    // edge set fits one task, the remaining O(log d) tail of tiny
    // rounds is pure scheduling latency — collapse it into a single
    // union-find task instead. Semantics-preserving: contraction only
    // relinks nodes TOWARD their component minimum, so the current
    // graph's components carry the original minima for every surviving
    // node, and nodes already absent map to themselves exactly as the
    // fixpoint gather does (measured: the q139 corpus graph, 13.7k
    // candidate edges, 4.0 s loop → one task; threshold edges bound
    // task memory at ~2 longs per node).
    def integralIds = und.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    def localFinish(): DataFrame = {
      val spark = und.sparkSession
      import spark.implicits._
      und.select(col("a").cast("long"), col("b").cast("long"))
        .coalesce(1).as[(Long, Long)]
        .mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) {
              val n = parent(c); parent(c) = r; c = n
            }
            r
          }
          it.foreach { case (a, b) =>
            if (!parent.contains(a)) parent(a) = a
            if (!parent.contains(b)) parent(b) = b
            val (ra, rb) = (find(a), find(b))
            // union by MIN id: the root is always the component minimum
            if (ra < rb) parent(rb) = ra
            else if (rb < ra) parent(ra) = rb
          }
          parent.keys.toArray.map(x => (x, find(x))).iterator
        }
        .toDF("src", "m")
    }
    while (!converged && iter < maxIters &&
        !(integralIds && nOld <= localFinishEdges)) {
      // large-star: (v, m(u)) for v ∈ N(u), v > u. Checkpointed: the
      // small phase reads it through four lineage branches (two gather
      // orientations × mins + re-link), so one dedicated
      // materialization beats racing recomputation (measured 2.5×).
      val both = bothWays(und)
      val large = canonical(both.filter(col("dst") > col("src"))
          .join(mins(both), Seq("src"))
          .select(col("dst").as("a"), col("m").as("b")))
        .trackedCheckpoint()
      // small-star: (v, m(u)) for v ∈ N(u), v < u, plus (u, m(u))
      val lboth = bothWays(large)
      val smallBase = lboth.filter(col("dst") < col("src"))
        .join(mins(lboth), Seq("src"))
      val small = canonical(smallBase
          .select(col("dst").as("a"), col("m").as("b"))
          .unionByName(smallBase.select(col("src").as("a"),
            col("m").as("b"))))
        .trackedCheckpoint()
      // set equality of two distinct sets: same size AND union adds
      // nothing — the union probe only runs once sizes agree (final
      // rounds), so a typical round costs one count action
      val nNew = small.count()
      converged = nOld == nNew &&
        small.unionByName(und).distinct().count() == nNew
      // round i's edge sets are dead once `small` is materialized and
      // the convergence probe (which reads the old `und`) has run
      graft.Checkpoints.drop(large)
      graft.Checkpoints.drop(und)
      und = small
      nOld = nNew
      iter += 1
    }
    // star fixpoint: every node sits directly on its component minimum;
    // below the local threshold the one-task union-find yields the same
    // (node → component-min) labels without the remaining rounds
    val labels =
      if (integralIds && nOld <= localFinishEdges && nOld > 0) localFinish()
      else mins(bothWays(und))
    nodes.join(labels, nodes("id") === labels("src"), "left")
      .select(col("id"), coalesce(col("m"), col("id")).as("cluster_rep"))
  }

  /** SimHash banded near-dup pairs (Manku et al. 2007's Hamming-space
    * join): split each `nBits` signature into `bands` equal bands; two
    * signatures become CANDIDATES iff any band matches exactly, then
    * verify `bit_count(xor) <= maxHamming`. EXACT (no recall loss) by
    * pigeonhole whenever `maxHamming < bands`: that many flipped bits
    * cannot touch every band — pinned as a ScalaCheck law on arbitrary
    * signature sets. The band join is an equi-join on (band, value)
    * whose fan-out is bucket occupancy, never all-pairs, and the only
    * carried state per row is the 8-byte signature itself.
    */
  def simHashNearDupPairs(sigs: DataFrame, id: String, sig: String,
                          nBits: Int = 32, bands: Int = 4,
                          maxHamming: Int = 3): DataFrame = {
    require(nBits % bands == 0, s"bands=$bands must divide nBits=$nBits")
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming=$maxHamming < bands=$bands")
    val width = nBits / bands
    // 1L << 64 wraps to 1 (mask 0 → every row in ONE bucket: the band
    // join silently degrades to all-pairs) — a 64-bit single band is
    // also semantically useless (maxHamming < bands forces 0)
    require(width < 64, s"band width $width must be < 64")
    val mask = (1L << width) - 1
    val banded = sigs
      .select(col(id).as("__i"), col(sig).cast("long").as("__s"))
      .select(col("__i"), col("__s"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("__b"))
      .withColumn("__v", expr(s"(__s >> (__b * $width)) & $mask"))
    banded.as("x").join(banded.as("y"),
        col("x.__b") === col("y.__b") && col("x.__v") === col("y.__v")
          && col("x.__i") < col("y.__i"))
      .select(col("x.__i").as("id_a"), col("y.__i").as("id_b"),
        expr("CAST(bit_count(x.__s ^ y.__s) AS BIGINT)").as("hamming"))
      // verify BEFORE deduplicating band collisions: hamming is a
      // function of the pair, so the filter commutes with distinct —
      // but it runs map-side on the join output, so only verified
      // pairs (a tiny fraction of candidates) pay the dedup exchange
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash (nBits-bit, default 32): per-token hash60, per-bit ±1 vote,
    * bit set iff vote sum > 0. Tokens weighted by occurrence (not
    * distinct), matching the classic Charikar construction.
    */
  def simHash(df: DataFrame, text: Column, id: Column,
              nBits: Int = 32): DataFrame =
    // fused native path: whole hash per document in one projection pass
    // (graft.expressions.SimHashBits) — no explode, no aggregate, no
    // exchange; [[simHashComposed]] is the executable spec (pinned
    // bit-equivalent in OperatorsSpec)
    df.select(id.as("__id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.SimHashBits(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            text.cast("string")), nBits)).as("simhash"))

  /** Composed built-in form of [[simHash]] (executable spec). */
  def simHashComposed(df: DataFrame, text: Column, id: Column,
                      nBits: Int = 32): DataFrame = {
    val toks = df.select(id.as("__id"), explode(split(text, " ")).as("__t"))
      .withColumn("__h", gf.hash60(col("__t")))
    val votes = (0 until nBits).map { b =>
      sum(when(shiftright(col("__h"), b) % 2 === 1, 1).otherwise(-1)).as(s"v$b")
    }
    groupByAgg(toks, col("__id"), votes)
      .select(col("__id"),
        (0 until nBits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
        ).reduce(_ + _).as("simhash"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * O(candidate pairs) — intended for *within-bucket* verification or
    * bounded subsets; the LSH variant is the full-corpus scale path.
    */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
                        w: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val ex = df.select(id.as("__id"), explode(shingles(text, w)).as("__sh"))
    val sizes = ex.groupBy(col("__id")).agg(count(lit(1)).as("n"))
    val a = ex.select(col("__sh"), col("__id").as("id_a"))
    val b = ex.select(col("__sh"), col("__id").as("id_b"))
    val inter = a.join(b, Seq("__sh")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("n", "na"), Seq("id_a"))
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("n", "nb"), Seq("id_b"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** LSH banding-parameter audit — the tuning artifact computed on a
    * bounded SAMPLE before committing (k, bands) for a full-corpus
    * near-dup run: for each candidate band count, the banded equi-join's
    * measured candidate volume, precision, and recall against the exact
    * Jaccard-≥-tau ground truth on the same sample. More bands (fewer
    * rows per band) slides the S-curve left: recall rises, precision
    * falls — this query measures where each config lands on THIS corpus
    * instead of trusting the 1-(1-s^r)^b formula's iid assumption.
    *
    * Returns one row per config: (bands, n_truth, n_candidates,
    * n_true_pos, precision, recall); precision/recall are null when
    * their denominator is 0.
    *
    * Scale (100 TB): ground truth is exact shared-shingle counting
    * ([[ngramJaccardPairs]]) — affordable precisely because the audit
    * runs on a sample; the banded joins are the production path
    * unchanged. The signature pass runs ONCE (localCheckpoint — the
    * per-shingle md5 dominates) and every config re-bands the same k
    * signature columns; candidate pairs shuffle as bare id pairs.
    */
  def lshTuningAudit(df: DataFrame, text: Column, id: Column,
                     k: Int = 16, bandsList: Seq[Int] = Seq(2, 4, 8),
                     w: Int = 3, tau: Double = 0.005): DataFrame = {
    require(bandsList.nonEmpty && bandsList.forall(b => b >= 1 && k % b == 0),
      s"every bands value must divide k=$k, got $bandsList")
    require(bandsList.distinct.size == bandsList.size,
      s"duplicate bands values in $bandsList")
    val sigs = minHashSignatures(df, text, id, k, w).trackedCheckpoint()
    val truth = ngramJaccardPairs(df, text, id, w, tau)
      .select(col("id_a"), col("id_b"))
    val candAll = bandsList.map { bands =>
      val r = k / bands
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws(",",
            (b * r until (b + 1) * r).map(i => col(s"sig$i")): _*)).as("sig"))
          .as(s"b$b")
      }
      val banded = sigs
        .select(col("__id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("__id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
      val a = banded.select(col("band"), col("sig"), col("__id").as("id_a"))
      val b = banded.select(col("band"), col("sig"), col("__id").as("id_b"))
      a.join(b, Seq("band", "sig"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
        .withColumn("bands", lit(bands))
    }.reduce(_ unionByName _)
    val perCfg = candAll
      .join(truth.withColumn("__t", lit(1L)), Seq("id_a", "id_b"), "left")
      .groupBy(col("bands"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("__t"), lit(0L))).as("n_true_pos"))
    // every requested config gets a row even with zero candidates
    import df.sparkSession.implicits._
    val base = bandsList.toDF("bands")
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    base.join(perCfg, Seq("bands"), "left")
      .crossJoin(broadcast(nTruth))
      .select(col("bands"), col("n_truth"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_true_pos"), lit(0L)).as("n_true_pos"))
      .withColumn("precision",
        when(col("n_candidates") > 0,
          round(col("n_true_pos").cast("double") / col("n_candidates"), 6)))
      .withColumn("recall",
        when(col("n_truth") > 0,
          round(col("n_true_pos").cast("double") / col("n_truth"), 6)))
  }

  /** Exact substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr
    * variant): every POSITIONAL w-token window whose content occurs in
    * ≥2 distinct documents marks its w token positions as duplicated;
    * overlapping marked windows coalesce into maximal spans. Unlike
    * [[shingles]]-based near-dup (set overlap, position-blind), this
    * finds verbatim repeated passages and reports exactly which tokens
    * they cover. Documents shorter than w tokens have no windows.
    *
    * Returns one row per document: (doc_id, total_tokens, dup_tokens,
    * n_spans) — dup_tokens is the size of the union of duplicated
    * windows, n_spans the number of maximal duplicated intervals.
    *
    * Scale (100 TB): the suffix-array the paper builds is replaced by
    * two hash shuffles — windows group by a 60-bit content hash
    * (partial-agg distinct-doc counting), then duplicated hashes join
    * back to positions. The shuffled window table carries (hash, doc,
    * pos) longs only, never gram strings. Span coalescing is a per-doc
    * window (doc_id is the partition key — per-group work is bounded by
    * document length, not corpus size). The md5-derived hash makes any
    * collision REPRODUCIBLE in the SQL oracle, so the hash is part of
    * the spec, not an approximation.
    */
  def substringDupStats(docs: DataFrame, text: Column, id: Column,
                        w: Int = 8): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val toks = docs.select(id.as("doc_id"), split(text, " ").as("t"))
      .select(col("doc_id"), size(col("t")).as("n"))
    val wins = docs
      .select(id.as("doc_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.WindowHashExplode(
            org.apache.spark.sql.graft.ColumnBridge.expression(
              text.cast("string")), w)).as(Seq("pos", "gh")))
      // diamond DAG: wins feeds both the duplicate-hash set and the
      // positions join-back — materialize once so the per-window md5
      // (the dominant cost) is not computed twice
      .trackedCheckpoint()
    val dup = wins.select(col("gh"), col("doc_id")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("gh"))
    // Interval union in closed form: duplicated windows all have width
    // w, so sorting by start position also sorts end positions — each
    // window contributes min(gap-to-previous, w) newly covered tokens,
    // and starts a new maximal span iff the gap exceeds w. This avoids
    // materializing (and distinct-ing) the w× covered-index expansion;
    // the oracle deliberately KEEPS the brute-force index-union
    // spelling, so the closed form is checked against an independent
    // formulation, not a transliteration of itself.
    val hits = wins.join(dup, Seq("gh")).select(col("doc_id"), col("pos"))
    val spans = hits
      .withColumn("prevp", lag(col("pos"), 1)
        .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("prevp").isNull, lit(w.toLong))
          .otherwise(least(col("pos") - col("prevp"), lit(w))
            .cast("long"))).as("dup_tokens"),
        sum(when(col("prevp").isNull || col("pos") - col("prevp") > w, 1L)
          .otherwise(0L)).as("n_spans"))
    toks.select(col("doc_id"), col("n").cast("long").as("total_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** Composed-builtin twin of the fused window-hash generator inside
    * [[substringDupStats]] (the executable spec; equivalence pinned in
    * OperatorsSpec): positional w-gram strings materialized via
    * transform+slice, then hashed.
    */
  def substringWindowsComposed(docs: DataFrame, text: Column, id: Column,
                               w: Int): DataFrame =
    docs.select(id.as("doc_id"), split(text, " ").as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
      .filter(col("n") >= w)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, n - $w), i -> concat_ws(' ', slice(t, i + 1, $w)))"
      )).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), gf.hash60(col("g")).as("gh"))
}
