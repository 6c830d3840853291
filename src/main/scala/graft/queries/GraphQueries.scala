package graft.queries

import graft.Engine
import graft.operators.GraphOps
import graft.functions.{c_round => round}
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
        ORDER BY pr_scaled DESC, node LIMIT 30""")),

    // Offline recommender evaluation with a temporal split: top-3
    // co-purchase recommendations trained on pre-1999 orders, hit-rate
    // scored on held-out 1999+ baskets (a case = one (order, item) with
    // ≥2 items; a hit = some recommended item co-occurs). The eval-join
    // shape every production recsys pipeline runs: model build and
    // scoring are both hash joins; per-item top-3 rides the bounded-heap
    // operator, not a global sort; the verdict is exact integer counts.
    "q120_recsys_eval" -> QueryDef(
      build = (s, dir) => {
        val basket = Engine.table(s, dir, "lineitem")
          .join(Engine.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"),
            col("o_orderdate").as("d"))
          .distinct()
        val tr = basket.where(expr("d < TIMESTAMP '1999-01-01'"))
          .select(col("ok"), col("part"))
        val pairs = tr.as("a").join(tr.as("b"),
            col("a.ok") === col("b.ok") && col("a.part") =!= col("b.part"))
          .groupBy(col("a.part").as("src"), col("b.part").as("rec"))
          .agg(count(lit(1)).as("n"))
        val recs = graft.operators.Relational.topKPerKey(pairs,
            Seq(col("src")), Seq(col("n").desc, col("rec")), 3)
          .select(col("src"), col("rec"))
        val te = basket.where(expr("d >= TIMESTAMP '1999-01-01'"))
          .select(col("ok"), col("part"))
        val cases = te.join(
          te.groupBy(col("ok")).agg(count(lit(1)).as("sz"))
            .where(col("sz") >= 2).select(col("ok")), "ok")
        val hits = cases.join(recs, col("part") === col("src"))
          .join(te.select(col("ok"), col("part").as("rec")), Seq("ok", "rec"))
          .select(col("ok"), col("part")).distinct()
        cases.agg(count(lit(1)).as("n_cases"))
          .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
          .select(col("n_cases"), col("n_hits"),
            round(col("n_hits").cast("double") / col("n_cases"), 6)
              .as("hit_rate"))
      },
      oracle = Some("""
        WITH basket AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS part,
                          o_orderdate AS d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        tr AS (SELECT ok, part FROM basket
               WHERE d < TIMESTAMP '1999-01-01'),
        pairs AS (
          SELECT a.part AS src, b.part AS rec, count(*) AS n
          FROM tr a JOIN tr b ON a.ok = b.ok AND a.part != b.part
          GROUP BY 1, 2),
        recs AS (
          SELECT src, rec FROM (
            SELECT src, rec, row_number() OVER (PARTITION BY src
                     ORDER BY n DESC, rec) AS rn
            FROM pairs) WHERE rn <= 3),
        te AS (SELECT ok, part FROM basket
               WHERE d >= TIMESTAMP '1999-01-01'),
        cases AS (
          SELECT te.ok, te.part FROM te
          JOIN (SELECT ok FROM te GROUP BY ok HAVING count(*) >= 2) s
            USING (ok)),
        hits AS (
          SELECT DISTINCT c.ok, c.part
          FROM cases c JOIN recs r ON c.part = r.src
          JOIN te t ON t.ok = c.ok AND t.part = r.rec)
        SELECT (SELECT count(*) FROM cases) AS n_cases,
               (SELECT count(*) FROM hits) AS n_hits,
               round(CAST((SELECT count(*) FROM hits) AS DOUBLE)
                   / (SELECT count(*) FROM cases), 6) AS hit_rate"""))
  )
}
