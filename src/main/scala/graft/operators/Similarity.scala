package graft.operators

import graft.Checkpoints.TrackedCheckpointOps
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.expressions.Window
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `cosineTopK`: brute-force — exact, O(|queries| × |corpus|). The
  *    correctness baseline; at 100 TB only viable for small query sets
  *    against a broadcast corpus sample.
  *  - `lshBuckets` + `lshTopK`: random-hyperplane LSH — each vector maps
  *    to a small signature; search joins on the bucket key, so the
  *    pairwise stage is bounded by bucket occupancy. This is the scale
  *    path: one shuffle on bucket, AQE handles skewed buckets.
  *
  * Hyperplane signs are derived from md5 (deterministic, seedable) so the
  * SQL oracle reproduces bucketing exactly; dot products are sequential
  * left-folds matching DuckDB's list_dot_product evaluation order.
  */
object Similarity {

  /** Cast a float embedding to double (exact) for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity — fused native expression (one pass over the
    * pair; see graft.expressions.CosineSim), bit-identical to
    * [[cosineComposed]].
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CosineSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** The composed higher-order-function form (executable spec for the
    * fused expression; assumes equal-length inputs like the fused form).
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * rows of `corpus` (excluding self by id). Rank is deterministic:
    * (rounded similarity desc, neighbor id).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, vec: String,
                 id: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Per-query top-k rank: the bounded-heap operator
    * (`plans/TopKPerKey.scala`) keeps k candidates per query WITHOUT
    * sorting the scored expansion; `row_number` over the ≤k survivors
    * then re-derives the contract's rank column — that window sorts
    * k-row runs on the partitioning the heap already produced, instead
    * of the whole candidate set. Callers project the vector columns
    * away first so heap entries stay slim.
    */
  private def rankPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("sim").desc, col("neighbor_id").asc)
    val kept = Relational.topKPerKey(scored, Seq(col("query_id")), order, k)
    val w = Window.partitionBy(col("query_id")).orderBy(order: _*)
    kept.withColumn("rank", row_number().over(w))
  }

  /** Deterministic ±1 sign for hyperplane `plane`, dimension `dim`:
    * parity of the first md5 byte of "plane:dim". Computed driver-side —
    * the planes are literals in the plan (and in the SQL oracle).
    */
  def planeSign(plane: Int, dim: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes(StandardCharsets.UTF_8))
    if ((d(0) & 1) == 1) 1 else -1
  }

  /** Sign matrix as literal arrays: planes × dims. */
  def planeSigns(nPlanes: Int, dims: Int): Seq[Seq[Int]] =
    (0 until nPlanes).map(p => (0 until dims).map(d => planeSign(p, d)))

  /** LSH bucket id: bit p set iff dot(v, plane_p) > 0. Fused native
    * expression (one pass over all planes; see
    * graft.expressions.LshBucket) — bit-identical to [[lshBucketComposed]].
    * `signs` must be [[planeSigns]] output (the expression re-derives the
    * same matrix from its shape).
    */
  def lshBucket(v: Column, signs: Seq[Seq[Int]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.LshBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(v),
        nPlanes = signs.length, dims = signs.head.length))

  /** Composed built-in form (executable spec for the fused expression). */
  def lshBucketComposed(v: Column, signs: Seq[Seq[Int]]): Column =
    signs.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.map(s => lit(s.toDouble)): _*)
      when(dot(v, planeLit) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: join queries to corpus on the LSH bucket, rank within
    * bucket by cosine. Recall < 1 by construction (that is the trade);
    * bucket width is 2^nPlanes.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vec: String, id: String,
              k: Int, nPlanes: Int, dims: Int): DataFrame = {
    val signs = planeSigns(nPlanes, dims)
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), signs))
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), signs))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("sim"))
    rankPerQuery(scored, k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query vector, the k most-similar corpus vectors carrying a
    * DIFFERENT label — near the query in embedding space but of another
    * class, the examples a contrastive/reranker loss learns most from.
    * Candidates come from the LSH bucket join (never all-pairs), the
    * label-mismatch predicate rides the join, and ranking is the
    * bounded-heap per-key top-k — the exact q37 scale shape plus one
    * filter. `queryPred` selects the query rows (e.g. a sampled slice).
    */
  def hardNegatives(vectors: DataFrame, vec: String, id: String,
                    label: String, queryPred: Column, k: Int,
                    nPlanes: Int, dims: Int): DataFrame = {
    val signs = planeSigns(nPlanes, dims)
    val v = vectors.select(col(id), asDouble(col(vec)).as("__v"),
        col(label).as("__l"))
      .withColumn("bucket", lshBucket(col("__v"), signs))
    val q = v.filter(queryPred)
      .select(col(id).as("query_id"), col("__v").as("qv"),
        col("__l").as("qlabel"), col("bucket"))
    val c = v.select(col(id).as("neighbor_id"), col("__v").as("cv"),
      col("__l").as("nlabel"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("qlabel") =!= col("nlabel"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("neighbor_id"),
        col("nlabel").as("neg_label"), col("sim"))
    rankPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("rank"), col("sim"))
  }

  /** IVF (inverted-file) coarse quantization: assign every vector to its
    * nearest centroid (max cosine; ties → smaller centroid id). The
    * centroid set broadcasts, so assignment is map-side — the only
    * shuffle in an IVF search is the final per-cluster ranking. This is
    * the 100 TB ANN path: probe `nprobe` lists instead of the corpus.
    *
    * Centroids here are a deterministic corpus sample (callers pass any
    * DataFrame of (centroid_id, cv)); production would k-means them —
    * the query shape is identical.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                vecCol: String, idCol: String): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    // Argmax as max_by over a packed (similarity, -centroid_id) long, not
    // a row_number window: the broadcast join expands each vector into
    // #centroids rows, and a window would SHUFFLE that whole expansion
    // (corpus × centroids rows at 100 TB) just to pick one row per
    // vector. max_by keeps the map-side partial pass — the expansion is
    // reduced back to one row per vector before the exchange.
    // Packing: round(cosine·1e6) orders identically to the 6-decimal
    // rounding the ranking contract (and the SQL oracle) uses; |csim·1e6|
    // ≤ 1e6 and centroid ids < 2^32 keep the pack exact in a long.
    val scored = v.join(broadcast(centroids), lit(true))
      .withColumn("__ord",
        round(cosine(col("v"), col("cv")) * 1e6).cast("long") * lit(1L << 32)
          - col("centroid_id"))
    scored.groupBy(col("vid"))
      .agg(max_by(struct(col("v"), col("centroid_id").as("cluster_id")),
        col("__ord")).as("__best"))
      .select(col("vid"), col("__best.v").as("v"),
        col("__best.cluster_id").as("cluster_id"))
  }

  /** IVF top-k: queries probe their `nprobe` nearest centroid lists and
    * rank candidates by cosine within them. Recall grows with nprobe;
    * nprobe = #centroids degenerates to exact search.
    *
    * Probe selection is a pure PROJECTION: the centroid matrix (k×dims
    * doubles — bounded by construction, like the reference's catalog
    * dicts) ships as a plan literal, and each query row sorts its own
    * k-entry (−sim, id) array to pick nprobe lists. No crossJoin
    * expansion, no window shuffle on the query side — at 100 TB a
    * billion queries probe map-side; the only shuffles left are the
    * corpus assignment's partial-agg and the final per-query ranking.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vec: String, id: String,
              k: Int, centroids: DataFrame, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, vec, id)
      .select(col("vid").as("neighbor_id"), col("v").as("cv2"), col("cluster_id"))
    rankProbed(probeLists(queries, vec, id, centroids, nprobe), assigned, k)
  }

  /** Probe selection as a pure projection (shared by [[ivfTopK]] and
    * [[searchIvfIndex]]): each query row picks its `nprobe` nearest
    * centroid lists from the plan-literal centroid matrix. Returns
    * (query_id, qv, cluster_id) — one row per probed list.
    */
  private def probeLists(queries: DataFrame, vec: String, id: String,
                         centroids: DataFrame, nprobe: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val cRows = centroids.select(col("centroid_id").cast("long"), col("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val cMat = typedlit(cRows.map(_._2).toSeq)
    val cIds = typedlit(cRows.map(_._1).toSeq)
    q.withColumn("__top", slice(sort_array(transform(
        sequence(lit(1), lit(cRows.length)),
        i => struct(
          (-round(cosine(col("qv"), element_at(cMat, i)), 6)).as("negsim"),
          element_at(cIds, i).as("cid")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("__top.cid")).as("cluster_id"))
  }

  /** Score the probed lists and rank per query (tail shared by both IVF
    * search paths).
    */
  private def rankProbed(probed: DataFrame, assigned: DataFrame,
                         k: Int): DataFrame = {
    val scored = probed.join(assigned, Seq("cluster_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv2")), 6))
      .select(col("query_id"), col("cluster_id"), col("neighbor_id"),
        col("sim"))
    rankPerQuery(scored, k)
      .select(col("query_id"), col("cluster_id"), col("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Persist the IVF index AT REST: the corpus assigned to its centroid
    * lists, hive-partitioned by `cluster_id` — one directory per
    * inverted list. Pays the assignment once at build time; every
    * subsequent search reads ONLY its probed lists (see
    * [[searchIvfIndex]]). The 100 TB posture for a static corpus served
    * by many query batches — the at-rest twin of the in-flight
    * [[ivfTopK]].
    */
  def writeIvfIndex(corpus: DataFrame, centroids: DataFrame, vec: String,
                    id: String, path: String): Unit =
    ivfAssign(corpus, centroids, vec, id)
      .select(col("vid").as("neighbor_id"), col("v").as("cv2"),
        col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** INCREMENTAL index maintenance — the missing half of the
    * build-once/search-many posture: new vectors assign to the SAME
    * frozen centroids (assignment is a pure function of vector and
    * centroid matrix, so placement is identical to a full rebuild) and
    * land as new files inside their list directories via a partitioned
    * append. Search sees them immediately with no rebuild and no index
    * downtime; list membership after any append sequence equals
    * [[writeIvfIndex]] over the union corpus (spec-pinned). Small
    * files accumulate per touched list at high append rates — pair
    * with `Engine.compact` per list directory, exactly the streaming
    * stores' compaction story.
    */
  def appendToIvfIndex(newVecs: DataFrame, centroids: DataFrame,
                       vec: String, id: String, path: String): Unit =
    ivfAssign(newVecs, centroids, vec, id)
      .select(col("vid").as("neighbor_id"), col("v").as("cv2"),
        col("cluster_id"))
      .write.mode("append").partitionBy("cluster_id").parquet(path)

  /** Search a persisted IVF index: probe selection is [[ivfTopK]]'s
    * map-side projection; the union of probed list ids is bounded by
    * |centroids| (never by |queries|), so it collects like the centroid
    * matrix and becomes a LITERAL `isin` partition filter — the scan
    * prunes unprobed list directories at PLANNING time (PartitionFilters,
    * pinned in ScaleToolkitSpec) and never lists, opens, or reads them.
    * Results are identical to [[ivfTopK]] over the same corpus,
    * centroids, and nprobe.
    */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, vec: String, id: String,
                     centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = probeLists(queries, vec, id, centroids, nprobe)
    val probedIds = probed.select(col("cluster_id")).distinct()
      .collect().map(_.getLong(0)) // ≤ |centroids| — bounded by construction
    val index = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probedIds.toSeq: _*))
      .select(col("neighbor_id"), col("cv2"),
        col("cluster_id").cast("long").as("cluster_id"))
    rankProbed(probed, index, k)
  }

  /** Spherical k-means (Lloyd's) for IVF centroid training — fills the
    * "production would k-means them" slot of [[ivfTopK]]'s centroid
    * parameter. Deterministic throughout: initial centroids are the k
    * first corpus vectors in md5(id) order (a stable pseudo-random
    * sample), assignment ties break on centroid id, and the iteration
    * count is fixed.
    *
    * Each iteration is two shuffles: the broadcast-centroid assignment
    * ([[ivfAssign]] — map-side partial max_by), then an element-wise
    * mean by (cluster, dimension) via posexplode. State per iteration is
    * k×dims doubles — trivially broadcastable at any corpus size; the
    * corpus itself is only ever scanned, never collected. Empty clusters
    * keep their previous centroid. Objective (sum of assigned cosines)
    * is non-decreasing per Lloyd's argument — pinned in OperatorsSpec.
    */
  def kmeans(corpus: DataFrame, vecCol: String, idCol: String,
             k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val v = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    // seed selection: k first vectors in md5(vid) order via orderBy+limit
    // — TakeOrderedAndProject keeps a k-heap per partition and the driver
    // merges k·P rows, vs. a global row_number window that would funnel
    // the WHOLE corpus through one task. The k seed vectors (k×dims
    // doubles) are bounded by construction, like the centroid matrix
    // collect in ivfAssign, so they come back as a local dim table.
    val seeds = v.orderBy(md5(col("vid").cast("string")), col("vid"))
      .limit(k).select(col("v")).collect()
      .zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](0))
      }
    var centroids = spark.createDataFrame(seeds.toIndexedSeq)
      .toDF("centroid_id", "cv")
      .trackedCheckpoint()
    var it = 0
    while (it < iters) {
      val assigned = ivfAssign(v, centroids, "v", "vid")
      // per-dimension sums as exact 1e-9-quantized integers: double sums
      // merge in partition order, so raw float means would make the
      // trained centroids depend on partitioning; integer sums make the
      // whole training partitioning-invariant (law in OperatorsSpec)
      val sums = assigned
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster_id"), col("dim"))
        .agg(sum(round(col("x") * lit(1e9)).cast("long")).as("sxi"))
      val next = centroidsFromSums(sums, centroids).trackedCheckpoint()
      // iteration i's blocks are dead once i+1 is materialized — free
      // them now so k iterations never hold more than two centroid sets
      graft.Checkpoints.drop(centroids)
      centroids = next
      it += 1
    }
    centroids
  }

  /** Fold per-(cluster, dim) 1e-9-quantized integer sums into spherical
    * centroids — the shared tail of the batch trainer ([[kmeans]]) and
    * the streaming epoch (`StreamOps.finishKmeansStream`), kept in ONE
    * place so the stream's batch-equivalence law cannot drift: exact-sum
    * dimension means, renormalize the mean direction, and clusters with
    * no sums keep their previous centroid. `sums` needs
    * (cluster_id, dim, sxi); `prev` is the (centroid_id, cv) table.
    */
  def centroidsFromSums(sums: DataFrame, prev: DataFrame): DataFrame = {
    val means = sums
      .groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("sxi"))))
        .as("pairs"))
      .select(col("cluster_id").as("centroid_id"),
        transform(col("pairs"),
          p => p.getField("sxi").cast("double") / lit(1e9)).as("mv"))
    val renormed = means.withColumn("mnorm", norm(col("mv")))
      .select(col("centroid_id"),
        transform(col("mv"), x => x / col("mnorm")).as("nv"))
    prev.join(renormed, Seq("centroid_id"), "left")
      .select(col("centroid_id"), coalesce(col("nv"), col("cv")).as("cv"))
  }

  /** Deterministic ±1 codebook entry for PQ subspace `j`, centroid `k`,
    * local dimension `d` (1-based): parity of the first md5 hex char of
    * "pq:j:k:d" — the exact value `CAST('0x'||substr(md5(s),1,1) AS INT)
    * % 2` reproduces in ANSI SQL.
    */
  def pqSign(j: Int, k: Int, d: Int): Long = {
    val dig = MessageDigest.getInstance("MD5")
      .digest(s"pq:$j:$k:$d".getBytes(StandardCharsets.UTF_8))
    if (((dig(0) >> 4) & 1) == 0) 1L else -1L
  }

  /** Product-quantization encode: split each vector into `subspaces`
    * blocks of `subDim` dims, assign each block to the nearest of
    * `codebook` (≤16) deterministic ±1 centroids, pack the codes into
    * one BIGINT (4 bits per subspace). With unit-norm ±1 centroids,
    * nearest-by-L2 is argmax of the dot product; dots run over
    * 1e6-quantized integer components, so every sum is order-proof and
    * the argmax (first-max tie-break) is engine-exact. Pure per-row
    * projection — zero shuffle, whole-stage codegen; at 100 TB this is
    * the map-side compression pass before an ANN index build (8× memory
    * cut per subspace byte).
    */
  def pqEncode(vectors: DataFrame, vec: String, id: String,
               subspaces: Int = 8, codebook: Int = 16,
               subDim: Int = 8): DataFrame = {
    require(codebook <= 16, "pq_code packs 4 bits per subspace")
    val qDims = (1 to subspaces * subDim).map(i =>
      expr(s"CAST(round(element_at($vec, $i) * 1e6) AS LONG)").as(s"__q$i"))
    val base = vectors.select((col(id) +: qDims): _*)
    val codes = (0 until subspaces).map { j =>
      val dots = (0 until codebook).map { k =>
        (1 to subDim).map { d =>
          val q = col(s"__q${j * subDim + d}")
          if (pqSign(j, k, d) > 0) q else -q
        }.reduce(_ + _)
      }
      val arr = array(dots: _*)
      (array_position(arr, array_max(arr)) - 1).as(s"__c$j")
    }
    base.select((col(id) +: codes): _*)
      .select(col(id),
        (0 until subspaces).map(j => col(s"__c$j") * lit(1L << (4 * j)))
          .reduce(_ + _).as("pq_code"))
  }

  /** Multi-index PQ ANN: the per-subspace PQ codes form `subspaces`
    * inverted indexes; a corpus vector becomes a candidate when it
    * shares ≥ `minMatch` subspace codes with the query (posting-list
    * equi-join on (subspace, code) + match-count filter), and the
    * candidate set re-ranks by exact cosine. At 100 TB the posting join
    * replaces the all-pairs expansion with |queries| × avg-posting-list
    * rows and the expensive scoring touches only candidates — the
    * IVFADC-style two-stage search re-expressed as joins.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vec: String, id: String,
             k: Int, minMatch: Int = 2, subspaces: Int = 8): DataFrame = {
    def postings(df: DataFrame, as: String) =
      pqEncode(df, vec, id, subspaces = subspaces)
        .select(col(id).as(as), explode(array((0 until subspaces).map(j =>
          struct(lit(j).as("j"),
            shiftright(col("pq_code"), 4 * j).bitwiseAND(lit(15L))
              .as("code"))): _*)).as("jc"))
        .select(col(as), col("jc.j").as("j"), col("jc.code").as("code"))
    val cand = postings(queries, "query_id")
      .join(postings(corpus, "neighbor_id"), Seq("j", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("n_match"))
      .where(col("n_match") >= minMatch)
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"),
      asDouble(col(vec)).as("cv"))
    val scored = cand.join(q, "query_id").join(c, "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("neighbor_id"), col("n_match"), col("sim"))
    rankPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("n_match"),
        col("rank"), col("sim"))
  }

  /** Embedding near-duplicate pairs: same LSH bucket AND cosine ≥ τ.
    * The dedup decision keeps the smaller id.
    */
  def embeddingNearDupPairs(df: DataFrame, vec: String, id: String,
                            tau: Double, nPlanes: Int, dims: Int): DataFrame = {
    val signs = planeSigns(nPlanes, dims)
    val v = df.select(col(id).as("vid"), asDouble(col(vec)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), signs))
    val a = v.select(col("bucket"), col("vid").as("keep_id"), col("v").as("va"))
    val b = v.select(col("bucket"), col("vid").as("dup_id"), col("v").as("vb"))
    a.join(b, Seq("bucket")).filter(col("keep_id") < col("dup_id"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= tau)
      .select(col("keep_id"), col("dup_id"), col("sim"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering first, then comparing pairwise ONLY
    * within a cluster. A vector is dropped when some same-cluster
    * vector with higher keep-priority sits within cosine ≥ τ of it;
    * keep-priority follows the paper's best-performing rule — keep the
    * example FARTHEST from its centroid (lowest centroid cosine; ties
    * break on id), dropping the redundant interior of each semantic
    * neighborhood.
    *
    * Returns every vector: (vec_id, cluster_id, cent_sim, kept) — the
    * survivor set is `kept`, and the flag form lets callers audit drop
    * rates per cluster rather than just filter.
    *
    * 100 TB shape: clustering is what makes semantic dedup tractable —
    * the quadratic stage is bounded by cluster size, never corpus size
    * (k scales with the corpus to hold cluster sizes flat; the paper
    * runs k=50k on LAION). Assignment is the [[ivfAssign]] broadcast
    * argmax (map-side, one partial-agg exchange); the pairwise stage is
    * an equi-join on cluster_id; the dropped set shuffles as bare ids
    * and anti-joins back. Determinism: similarities pre-round to 6
    * decimals on both sides of every comparison, ties break on id —
    * same contract the DuckDB oracle replays (q138).
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame, vec: String,
               id: String, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val assigned = semDedupAssign(corpus, centroids, vec, id)
      .trackedCheckpoint() // feeds the pair join twice + the final join-back
    // Candidate pairs shuffle as BARE (id, cent_sim) rows — the PPJoin
    // discipline (Relational.similaritySelfJoin): the cluster_id join is
    // the skew-prone exchange (a hot cluster concentrates in one task),
    // so it must carry ids and one double, never the d-dim vectors. The
    // vectors re-join by vid afterward — uniform-hash exchanges no
    // cluster skew can concentrate.
    val slim = assigned.select(col("cluster_id"), col("vid"), col("cent_sim"))
    val a = slim.select(col("cluster_id"), col("vid").as("ka"),
      col("cent_sim").as("ca"))
    val b = slim.select(col("cluster_id"), col("vid").as("kb"),
      col("cent_sim").as("cb"))
    val cand = a.join(b, Seq("cluster_id"))
      .filter(col("ka") =!= col("kb") &&
        (col("ca") < col("cb") ||
          (col("ca") === col("cb") && col("ka") < col("kb"))))
      .select(col("ka"), col("kb"))
    val vtab = assigned.select(col("vid"), col("v"))
    val dropped = cand
      .join(vtab.select(col("vid").as("ka"), col("v").as("va")), Seq("ka"))
      .join(vtab.select(col("vid").as("kb"), col("v").as("vb")), Seq("kb"))
      .filter(round(cosine(col("va"), col("vb")), 6) >= tau)
      .select(col("kb").as("vid")).distinct()
    assigned
      .join(dropped.withColumn("__drop", lit(true)), Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cluster_id"), col("cent_sim"),
        coalesce(col("__drop"), lit(false)) === lit(false) as "kept")
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal,
    * the 2-approximation): seed with the minimum id, then m−1 times
    * select the vector farthest (max cosine DISTANCE 1−cos) from the
    * already-selected set — the classic diversity-selection pass that
    * picks maximally-spread exemplars from a corpus.
    *
    * Returns the m selected rows as (sel_rank, vec_id, dist), where
    * dist is the selection-time distance to the nearest prior center
    * (0 for the seed), as the exact 1e-9-quantized value — both engines
    * divide the same integer, so no rounding is needed.
    *
    * 100 TB shape: the selected set is bounded by m, so each round
    * ships the centers as a PLAN LITERAL (m×dims doubles, like
    * ivfTopK's probe matrix) and costs one corpus scan reduced by
    * TakeOrderedAndProject (per-partition 1-heaps; no sort, no window,
    * no join). m rounds of driver iteration IS the greedy algorithm —
    * each selection depends on the last. Determinism: distances
    * quantize to 1e-9 integers before the argmax; ties break on id.
    */
  def kCenterCoreset(corpus: DataFrame, vec: String, id: String,
                     m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = corpus.select(col(id).cast("long").as("vid"),
      asDouble(col(vec)).as("v")).trackedCheckpoint()
    val seed = v.orderBy(col("vid")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("empty corpus"))
    var selected = Vector((seed.getLong(0), seed.getSeq[Double](1), 0L))
    while (selected.length < m) {
      val centers = array(selected.map { case (_, cv, _) =>
        array(cv.map(lit): _*) }: _*)
      val mdq = array_min(transform(centers, c =>
        round((lit(1.0) - cosine(col("v"), c)) * 1e9).cast("long")))
      val best = v.filter(!col("vid").isInCollection(selected.map(_._1)))
        .select(col("vid"), col("v"), mdq.as("mdq"))
        .orderBy(col("mdq").desc, col("vid")).limit(1).collect()
      if (best.isEmpty) return selectedDf(spark, selected) // corpus < m
      selected :+= ((best(0).getLong(0), best(0).getSeq[Double](1),
        best(0).getLong(2)))
    }
    selectedDf(spark, selected)
  }

  private def selectedDf(spark: org.apache.spark.sql.SparkSession,
      sel: Vector[(Long, Seq[Double], Long)]): DataFrame = {
    import spark.implicits._
    sel.zipWithIndex.map { case ((vid, _, mdq), i) =>
      (i + 1L, vid, mdq.toDouble / 1e9)
    }.toDF("sel_rank", "vec_id", "dist")
  }

  /** [[semDedup]]'s assignment stage, exposed un-checkpointed so the
    * plan pin can see the broadcast argmax (the checkpoint the full
    * operator takes hides everything upstream behind an ExistingRDD
    * scan): [[ivfAssign]]'s packed max_by, also carrying the winning
    * cosine — the packed long orders by (round(cos·1e6), −centroid_id),
    * so the unpacked round(cos, 6) is exactly the argmax centroid's
    * similarity.
    */
  private[graft] def semDedupAssign(corpus: DataFrame, centroids: DataFrame,
                                    vec: String, id: String): DataFrame = {
    val v = corpus.select(col(id).as("vid"), asDouble(col(vec)).as("v"))
    val scored = v.join(broadcast(centroids), lit(true))
      .withColumn("__ord",
        round(cosine(col("v"), col("cv")) * 1e6).cast("long") * lit(1L << 32)
          - col("centroid_id"))
    scored.groupBy(col("vid"))
      .agg(max_by(struct(col("v"), col("centroid_id").as("cluster_id"),
          round(cosine(col("v"), col("cv")), 6).as("cent_sim")),
        col("__ord")).as("__best"))
      .select(col("vid"), col("__best.v").as("v"),
        col("__best.cluster_id").as("cluster_id"),
        col("__best.cent_sim").as("cent_sim"))
  }
}
