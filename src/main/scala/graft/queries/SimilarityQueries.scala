package graft.queries

import graft.Engine
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search coverage over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k as the exactness baseline, random-hyperplane
  * LSH bucketing as the 100 TB path, and embedding near-dup pairs.
  *
  * Oracle note: both engines compute dot products as sequential
  * left-folds over the same doubles (float→double cast is exact), so raw
  * similarities agree bit-for-bit; outputs still round to 6 decimals.
  */
object SimilarityQueries {

  private val Dims = 64
  private val Planes = 8

  /** DuckDB cosine with explicit dot/norm (mirrors Similarity.cosine). */
  private def sqlCos(a: String, b: String): String =
    s"""(list_dot_product($a, $b)
        / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"""

  /** The plane-sign matrix as DuckDB list literals. */
  private def sqlPlanes: Seq[String] =
    Similarity.planeSigns(Planes, Dims).map(p =>
      p.map(s => s"$s.0").mkString("[", ", ", "]"))

  /** DuckDB LSH bucket expression over a DOUBLE[] column `v`. */
  private def sqlBucket(v: String): String =
    sqlPlanes.zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN list_dot_product($v, $plane) > 0.0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val defs: Seq[(String, QueryDef)] = Seq(

    // Brute-force cosine top-3 for every 50th vector — exact baseline.
    "q36_cosine_topk" -> QueryDef(
      build = (s, dir) => {
        val e = Engine.table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") % 50 === 0)
        Similarity.cosineTopK(e, queries, "embedding", "vec_id", k = 3)
      },
      oracle = Some(s"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(${sqlCos("q.vec", "c.vec")}, 6) AS sim
          FROM v q JOIN v c ON q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3"""),
      headline = true),

    // LSH-bucketed ANN — the scale path: candidates only within the
    // 8-hyperplane bucket, ranked by cosine.
    "q37_ann_lsh" -> QueryDef(
      build = (s, dir) => {
        val e = Engine.table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") % 50 === 0)
        Similarity.lshTopK(e, queries, "embedding", "vec_id",
          k = 3, nPlanes = Planes, dims = Dims)
      },
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, vec, ${sqlBucket("vec")} AS bucket
          FROM (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)),
        scored AS (
          SELECT q.vec_id AS query_id, q.bucket AS bucket,
                 c.vec_id AS neighbor_id,
                 round(${sqlCos("q.vec", "c.vec")}, 6) AS sim
          FROM v q JOIN v c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
          WHERE q.vec_id % 50 = 0),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT query_id, bucket, neighbor_id, rank, sim
        FROM ranked WHERE rank <= 3""")),

    // Embedding near-dup pairs: same bucket AND cosine ≥ τ (τ=0.3 — the
    // synthetic vectors are noise; real corpora would use ~0.95).
    "q38_embedding_neardup" -> QueryDef(
      build = (s, dir) => {
        val e = Engine.table(s, dir, "embeddings")
        Similarity.embeddingNearDupPairs(e, "embedding", "vec_id",
          tau = 0.3, nPlanes = Planes, dims = Dims)
      },
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, vec, ${sqlBucket("vec")} AS bucket
          FROM (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings))
        SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
               round(${sqlCos("a.vec", "b.vec")}, 6) AS sim
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(${sqlCos("a.vec", "b.vec")}, 6) >= 0.3"""))
  )
}
