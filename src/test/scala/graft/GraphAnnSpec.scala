package graft

import graft.operators.GraphAnn
import org.apache.spark.sql.functions._

/** Pins the graph-ANN machinery (q355) at the operator level:
  * adjacency determinism + degree bound, multi-view connectivity
  * beyond a single bucket, incremental append ≡ rebuild on the edge
  * set, and the beam-walk monotonicity that makes the final frontier
  * the global top-of-scored.
  */
class GraphAnnSpec extends SparkSpec {

  private val (m, views, vplanes, dims) = (6, 3, 6, 64)

  private lazy val nodes = GraphAnn.nodes(
    Engine.table(spark, sf(), "embeddings"), "embedding", "vec_id",
    vplanes, dims).cache()

  test("adjacency: deterministic, degree <= M, no self loops, " +
    "multi-view edges cross view-0 buckets") {
    val adj = GraphAnn.adjacency(nodes, 0, m, views, vplanes, dims)
      .cache()
    val a1 = adj.orderBy("src", "dst").collect()
    val a2 = GraphAnn.adjacency(nodes, 0, m, views, vplanes, dims)
      .orderBy("src", "dst").collect()
    assert(a1.sameElements(a2))
    assert(adj.filter(col("src") === col("dst")).count() == 0)
    val maxDeg = adj.groupBy("src").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDeg <= m)
    // navigability: some edge must leave the source's view-0 bucket
    val nb = nodes.select(col("node").as("dst"),
      col("bucket").as("dbucket"))
    val crossing = adj.join(nb, Seq("dst"))
      .filter(col("bucket") =!= col("dbucket")).count()
    assert(crossing > 0, "single-view graphs are disconnected islands")
  }

  test("append ≡ rebuild, byte-exact on edges, both layers") {
    val newNodes = nodes.filter(col("node") % 7 === 3)
    val baseNodes = nodes.filter(col("node") % 7 =!= 3)
    for (l <- Seq(0, 1)) {
      val appended = GraphAnn.appendAdjacency(
        GraphAnn.adjacency(baseNodes, l, m, views, vplanes, dims),
        nodes, newNodes, l, m, views, vplanes, dims)
      val rebuilt =
        GraphAnn.adjacency(nodes, l, m, views, vplanes, dims)
      assert(rebuilt.exceptAll(appended).count() == 0 &&
        appended.exceptAll(rebuilt).count() == 0, s"layer $l")
    }
  }

  test("walk: frontiers never shrink in quality — the final beam is " +
    "the top-beam of everything scored") {
    val adj = GraphAnn.adjacency(nodes, 0, m, views, vplanes, dims)
    val queries = nodes.filter(col("node") % 250 === 0)
      .select(col("node").as("query_id"), col("nv").as("qv"))
    val f0 = GraphAnn.beamOf(
      queries.select(col("query_id"),
        col("query_id").as("node")),
      nodes, queries, beam = 4)
    val frs = GraphAnn.walk(f0, adj, nodes, queries, hops = 2,
      beam = 4)
    val bests = frs.map(_.groupBy("query_id").agg(max("sim"))
      .orderBy("query_id").collect().map(_.getDouble(1)).toSeq)
    bests.zip(bests.tail).foreach { case (prev, next) =>
      prev.zip(next).foreach { case (p, n) => assert(n >= p) }
    }
  }
}
