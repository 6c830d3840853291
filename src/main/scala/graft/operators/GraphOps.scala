package graft.operators

import org.apache.spark.sql.DataFrame
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the co-purchase /
  * citation-graph shapes a training-data pipeline reaches for when it
  * ranks or clusters entities (Dedup.dupClusters holds the connected-
  * components twin of this file).
  *
  * Everything is exact integer arithmetic so results are independent of
  * accumulation order, partitioning, and engine: ranks are scale-scaled
  * BIGINTs, per-edge contributions use integer division by degree, and
  * each damping step rounds exactly once (single float op chain).
  *
  * Scale (100 TB): one hash shuffle per iteration (contributions group
  * by dst); the degree table joins in once up front so the per-iteration
  * join carries only (src, dst, deg). Iteration count is fixed and
  * small — the plan is a finite DAG, no driver-side convergence loop
  * reading results back.
  */
object GraphOps {

  /** Undirected (a < b) edge list → both directed arcs. */
  def symmetrize(edges: DataFrame, a: String, b: String): DataFrame =
    edges.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(edges.select(col(b).as("src"), col(a).as("dst")))

  /** Fixed-iteration PageRank over a directed edge list with columns
    * (src, dst). Returns (node, pr_scaled) where pr_scaled is the
    * 1e12-scaled exact-integer rank after `iters` damped iterations.
    * Assumes every node has out-degree ≥ 1 (true for symmetrized
    * graphs) so no dangling-mass redistribution is needed.
    */
  def pageRankScaled(edges: DataFrame, iters: Int,
                     damping: Double = 0.85): DataFrame = {
    val scale = 1000000000000L
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = edges.join(deg, "src")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val teleport = round(
      lit(scale * (1.0 - damping)) / col("n_nodes") +
        lit(damping) * col("s")).cast("long")
    var ranks = deg.crossJoin(broadcast(nNodes))
      .select(col("src").as("node"),
        expr(s"CAST($scale DIV n_nodes AS LONG)").as("r"))
    for (_ <- 1 to iters) {
      ranks = eDeg.join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("r DIV deg")).as("s"))
        .crossJoin(broadcast(nNodes))
        .select(col("dst").as("node"), teleport.as("r"))
    }
    ranks.select(col("node"), col("r").as("pr_scaled"))
  }
}
