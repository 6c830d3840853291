package graft.queries

import graft.Engine
import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the co-purchase graph
  * (`operators/GraphOps.scala`) — engine extensions past the one-shot
  * relational surface. The connected-components / triangle shapes live
  * with Dedup (q57) and Analytics (q110); this file holds the
  * fixed-iteration ranking walk.
  */
object GraphQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // 3-iteration PageRank (damping 0.85) over the support-2 co-purchase
    // graph. Exact 1e12-scaled integer ranks — order-proof sums, integer
    // division by degree, one rounding per damping step — so the DuckDB
    // oracle (three unrolled CTE iterations) matches bit-for-bit. One
    // shuffle per iteration; the degree join happens once up front.
    "q115_pagerank" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("n"))
          .where(col("n") >= 2)
          .select(col("pa"), col("pb"))
        GraphOps.pageRankScaled(GraphOps.symmetrize(pairs, "pa", "pb"), 3)
          .orderBy(col("pr_scaled").desc, col("node")).limit(30)
      },
      oracle = Some("""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        e AS (SELECT pa AS src, pb AS dst FROM e0
              UNION ALL SELECT pb, pa FROM e0),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT src AS node, 1000000000000 // n AS r
               FROM deg CROSS JOIN nn),
        r1 AS (SELECT e.dst AS node,
                      CAST(round(150000000000.0 / nn.n
                        + 0.85 * sum(r0.r // deg.deg)) AS BIGINT) AS r
               FROM e JOIN r0 ON e.src = r0.node
                      JOIN deg ON e.src = deg.src CROSS JOIN nn
               GROUP BY e.dst, nn.n),
        r2 AS (SELECT e.dst AS node,
                      CAST(round(150000000000.0 / nn.n
                        + 0.85 * sum(r1.r // deg.deg)) AS BIGINT) AS r
               FROM e JOIN r1 ON e.src = r1.node
                      JOIN deg ON e.src = deg.src CROSS JOIN nn
               GROUP BY e.dst, nn.n),
        r3 AS (SELECT e.dst AS node,
                      CAST(round(150000000000.0 / nn.n
                        + 0.85 * sum(r2.r // deg.deg)) AS BIGINT) AS r
               FROM e JOIN r2 ON e.src = r2.node
                      JOIN deg ON e.src = deg.src CROSS JOIN nn
               GROUP BY e.dst, nn.n)
        SELECT node, r AS pr_scaled FROM r3
        ORDER BY pr_scaled DESC, node LIMIT 30"""))
  )
}
