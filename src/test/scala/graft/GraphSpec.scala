package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ring(n: Int) =
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("a", "b")

  test("pageRank conserves mass to within one rounding per node per step") {
    val star = (1 to 9).map(i => (0L, i.toLong)).toDF("a", "b")
    val pr = GraphOps.pageRankScaled(GraphOps.symmetrize(star, "a", "b"), 3)
    val total = pr.agg(sum($"pr_scaled")).as[Long].head()
    // teleport + damped shares sum to scale exactly; each of the 10 nodes
    // rounds once per iteration and each contribution floors once.
    assert(math.abs(total - 1000000000000L) < 3 * 10 * 20)
  }

  test("pageRank ranks the star center above every leaf") {
    val star = (1 to 9).map(i => (0L, i.toLong)).toDF("a", "b")
    val pr = GraphOps.pageRankScaled(GraphOps.symmetrize(star, "a", "b"), 3)
      .orderBy($"pr_scaled".desc).select($"node").as[Long].collect()
    assert(pr.head == 0L)
  }

  test("pageRank on a regular ring is uniform and partitioning-invariant") {
    val e = GraphOps.symmetrize(ring(12), "a", "b")
    val a = GraphOps.pageRankScaled(e, 3)
      .orderBy($"node").as[(Long, Long)].collect()
    // 2-regular graph: every node identical by symmetry
    assert(a.map(_._2).distinct.length == 1)
    val b = GraphOps.pageRankScaled(e.repartition(7), 3)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(a.sameElements(b)) // exact-integer ranks ignore partitioning
  }
}
