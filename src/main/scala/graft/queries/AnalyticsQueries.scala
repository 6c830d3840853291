package graft.queries

import graft.Engine
import org.apache.spark.sql.expressions.Window
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Engine analytics extensions beyond the round-1 surface: grouping sets,
  * set ops, pivot, JSON extraction, ranked windows, deterministic
  * train/val/test splits, stratified sampling, TF-IDF, and histogram
  * profiling — the query shapes a training-data pipeline leans on around
  * the core dedup/similarity operators.
  *
  * Scale notes (100 TB): every query here is a bounded number of hash
  * shuffles — rollup/pivot ride the partial-agg path, the splits are pure
  * map-side projections (md5 of the key, no shuffle at all), stratified
  * sampling and TF-IDF shuffle once per grouping. Nothing collects to the
  * driver.
  */
object AnalyticsQueries {

  /** q89's pair expansion: every unordered pair of the sorted distinct
    * `parts` array as one packed long, via the native single-pass
    * generator (`expressions/PairPackExplode`).
    */
  private[graft] def pairPack(parts: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.PairPackExplode(
      ColumnBridge.expression(parts)))
  }

  /** Composed-builtin twin of [[pairPack]] (the executable spec; the
    * nested-transform chain materializes the O(n²) pair array per row
    * before exploding). Equivalence pinned in `OperatorsSpec`.
    */
  private[graft] def pairPackComposed(parts: String) = explode(expr(
    s"flatten(transform(sequence(1, size($parts) - 1), " +
      s"i -> transform(sequence(i + 1, size($parts)), " +
      s"j -> shiftleft(CAST(element_at($parts, i) AS BIGINT), 32) " +
      s"+ element_at($parts, j))))"))

  val defs: Seq[(String, QueryDef)] = Seq(

    // Grouping sets: ROLLUP over (returnflag, linestatus) — subtotals and
    // grand total in one pass (Spark expands to a single Expand + hash agg;
    // partial aggregation still applies).
    "q48_rollup_revenue" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(ExactAgg.sumExact(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
            count(lit(1)).as("n_items"),
            round(avg(col("l_quantity")), 4).as("avg_qty"))
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${ExactAgg.sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
               count(*) AS n_items,
               round(avg(l_quantity), 4) AS avg_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // CUBE: all four grouping sets of (status, priority) in one Expand
    // pass — complements q48's ROLLUP.
    "q61_cube_orders" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        orders.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            ExactAgg.sumExact(col("o_totalprice"), 2).as("total_price"))
      },
      oracle = Some(s"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               ${ExactAgg.sqlSum("o_totalprice", 2)} AS total_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // Explicit GROUPING SETS with grouping() flags, driven through the
    // SQL frontend — the third grouping-sets surface next to q48's
    // ROLLUP and q61's CUBE, with the indicator columns that
    // disambiguate a NULL key from a subtotal row. Money totals in
    // exact cents (order-proof).
    "q129_grouping_sets" -> QueryDef(
      build = (s, dir) => {
        Engine.table(s, dir, "orders").createOrReplaceTempView("q129_orders")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                 count(*) AS n_orders,
                 round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS DOUBLE) / 100.0, 2) AS total
          FROM q129_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
               count(*) AS n_orders,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS DOUBLE) / 100.0, 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // Set op: INTERSECT (distinct) — customers holding both an F and an O
    // order. Complements q13's EXCEPT.
    "q49_set_intersect" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val f = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val o = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        f.intersect(o)
      },
      oracle = Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")),

    // Pivot: order counts per status × priority. Spark's pivot with an
    // explicit value list stays a single hash aggregate; absent combos
    // surface as null counts → coalesced to 0 for oracle parity with
    // DuckDB's count(*) FILTER.
    "q50_pivot_priority" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val outs = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
        val pv = orders.groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", vals).agg(count(lit(1)))
        pv.select(col("o_orderstatus") +:
          vals.zip(outs).map { case (v, out) =>
            coalesce(col(s"`$v`"), lit(0L)).as(out) }: _*)
      },
      oracle = Some("""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
        FROM orders GROUP BY o_orderstatus""")),

    // JSON extraction from the events props column (semi-structured
    // payloads ride along every real event stream): group by the extracted
    // key, aggregate. get_json_object is codegen'd; no UDF.
    "q51_json_props" -> QueryDef(
      build = (s, dir) => {
        val ev = Engine.table(s, dir, "events")
        ev.withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("k_val"))
          .agg(count(lit(1)).as("n_events"),
            ExactAgg.sumExact(col("value"), 4).as("sum_value"))
      },
      oracle = Some(s"""
        SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k_val,
               count(*) AS n_events,
               ${ExactAgg.sqlSum("value", 4)} AS sum_value
        FROM events GROUP BY 1""")),

    // Ranked analytics: top-5 spenders per market segment with the gap
    // to the next-better customer. The top-5 cut rides the bounded-heap
    // TopKPerKey exec (k candidates per key per partition — never a
    // per-segment sort of ALL customers, which with 5 segments puts 1/5
    // of the table in one window task at any scale); rank and gap are
    // then a window over the ≤ 5×|segments|-row RESULT, bounded by
    // construction.
    "q52_segment_spend_rank" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val cust = Engine.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val totals = orders.groupBy(col("o_custkey"))
          .agg(ExactAgg.sumExact(col("o_totalprice"), 2).as("total"))
        val joined = totals
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("c_custkey"), col("total"))
        val top = graft.operators.Relational.topKPerKey(joined,
          keys = Seq(col("c_mktsegment")),
          order = Seq(col("total").desc, col("c_custkey")), k = 5)
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("total").desc, col("c_custkey"))
        top.withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("gap", round(coalesce(lag(col("total"), 1).over(w) - col("total"),
            lit(0.0)), 2))
          .select(col("c_mktsegment"), col("rnk"), col("c_custkey"),
            col("total"), col("gap"))
      },
      oracle = Some(s"""
        WITH totals AS (
          SELECT o_custkey, ${ExactAgg.sqlSum("o_totalprice", 2)} AS total
          FROM orders GROUP BY o_custkey),
        r AS (
          SELECT c_mktsegment, c_custkey, total,
                 row_number() OVER w AS rnk,
                 lag(total) OVER w AS prev
          FROM totals JOIN customer ON o_custkey = c_custkey
          WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total DESC, c_custkey))
        SELECT c_mktsegment, rnk, c_custkey, total,
               round(coalesce(prev - total, 0), 2) AS gap
        FROM r WHERE rnk <= 5""")),

    // Deterministic train/val/test split — the reproducible alternative to
    // random sampling for training corpora: md5 of the stable id buckets
    // every row the same way on every engine and every run. Pure map-side
    // projection: NO shuffle, survives any scale-up trivially.
    "q53_hash_split" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val h = substring(md5(col("doc_id").cast("string")), 1, 2)
        d.select(col("doc_id"),
          when(h < "1a", "test").when(h < "33", "val").otherwise("train")
            .as("split"))
      },
      oracle = Some("""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33' THEN 'val'
                    ELSE 'train' END AS split
        FROM documents"""),
      headline = true),

    // Stratified deterministic sample: 20% per language, chosen by md5
    // order so the subset is stable across engines/runs. The per-lang
    // rank AND count both come from the two-pass withStratumRankN — a
    // per-lang row_number window would funnel each language through one
    // task (English-skew straggler at scale); here every task holds one
    // balanced range slice and the quota filter is map-side arithmetic.
    "q54_stratified_sample" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string")).as("__u"))
        graft.operators.Relational.withStratumRankN(d, Seq("lang"),
            Seq(col("__u"), col("doc_id")), as = "__rnk", nAs = "__n")
          .filter(col("__rnk") <= (col("__n") + lit(4)) / lit(5))
          .select(col("doc_id"), col("lang"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT doc_id, lang FROM t WHERE rn <= (n + 4) // 5""")),

    // TF-IDF: highest-scoring term per document. Two hash shuffles (term
    // frequencies, document frequencies) + one window; the corpus size is
    // a broadcast scalar, never a driver collect.
    "q55_tfidf_top_term" -> QueryDef(
      build = (s, dir) => {
        // no fanOut: the split+explode is cheap enough on the scan task
        // that a rebalance ahead of it measures as a net loss (0.80 s →
        // 1.43 s at sf0.1) — fanOut pays off only for md5/cosine-heavy
        // per-row work (see Engine.fanOut)
        val d = Engine.table(s, dir, "documents")
        val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfc = toks.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = d.agg(count(lit(1)).as("n"))
        val scored = tf.join(dfc, "term").crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * log(col("n").cast("double") / col("df")))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("term"), round(col("score"), 6).as("tfidf"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        s AS (
          SELECT doc_id, term,
                 tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, term) AS rn
          FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, term, round(score, 6) AS tfidf FROM s WHERE rn = 1"""),
      headline = true),

    // Correlated scalar subqueries through the SQL frontend: orders worth
    // more than 1.5× their customer's average. Catalyst decorrelates the
    // two per-row subqueries into aggregate+join — no per-row execution.
    // The comparison runs in exact integer cents (prices are 2-decimal,
    // so round(p·100) is an exact long and `cents·n·2 > sum_cents·3`
    // ⟺ p > 1.5·avg) — a float avg would differ in the last ulp between
    // engines and could flip rows sitting on the boundary.
    "q58_above_avg_orders" -> QueryDef(
      build = (s, dir) => {
        Engine.table(s, dir, "orders").createOrReplaceTempView("q58_orders")
        s.sql("""
          SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
          FROM q58_orders o
          WHERE CAST(round(o_totalprice * 100) AS BIGINT)
                  * (SELECT count(*) FROM q58_orders i
                     WHERE i.o_custkey = o.o_custkey) * 2
                > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FROM q58_orders i WHERE i.o_custkey = o.o_custkey) * 3""")
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE CAST(round(o_totalprice * 100) AS BIGINT)
                * (SELECT count(*) FROM orders i
                   WHERE i.o_custkey = o.o_custkey) * 2
              > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 FROM orders i WHERE i.o_custkey = o.o_custkey) * 3""")),

    // Deterministic string aggregation: the distinct priorities seen per
    // order status, alphabetical. collect_set order is nondeterministic
    // by itself — sort_array makes it an engine-stable value.
    "q59_status_priorities" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        orders.groupBy(col("o_orderstatus"))
          .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"),
            count(lit(1)).as("n_orders"))
      },
      oracle = Some("""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus""")),

    // Running cumulative revenue per customer: prefix sums are computed
    // in the same deterministic order on both engines (the cum value is a
    // multiple of 0.01, so the 2-decimal round is exact regardless of
    // accumulated float epsilon).
    "q62_running_revenue" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders.select(col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("cum_revenue"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS cum_revenue
        FROM orders""")),

    // Inter-order gap in days per customer (lead): the re-engagement
    // metric shape; null gap marks each customer's latest order.
    "q63_order_gaps" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        orders.select(col("o_orderkey"), col("o_custkey"),
          datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
            .cast("long").as("gap_days"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               date_diff('day', o_orderdate,
                 lead(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)) AS gap_days
        FROM orders""")),

    // Bag-semantics set op: EXCEPT ALL keeps multiplicities (three 'R'
    // rows minus one 'A' row of the same key leaves two) — the multiset
    // complement of q13/q49's distinct set ops.
    "q69_except_all" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
        val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
        r.exceptAll(a)
      },
      oracle = Some("""
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'""")),

    // Rolling event-time window: 7-day revenue per customer via a RANGE
    // frame (peers by day, not by row) — the time-decayed feature shape.
    // One window exchange on the customer key; the frame is bounded (6
    // days), so window state never grows with history length. Sums run in
    // exact integer cents: a float running sum would drift between
    // engines, a cent sum cannot.
    "q72_rolling_revenue_7d" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-6, 0)
        orders.select(col("o_orderkey"), col("o_custkey"),
            datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("day"),
            expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
          .select(col("o_orderkey"), col("o_custkey"),
            round(sum(col("cents")).over(w) / 100.0, 2).as("rev_7d"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                       RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                 AS BIGINT) / 100.0, 2) AS rev_7d
        FROM orders"""),
      headline = true),

    // Exact second-moment statistics: correlation and sample stddev from
    // integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the sums are exact
    // longs on both engines (quantities are integers, discounts exact
    // cents), so the final fixed-order float formula is bit-identical,
    // unlike built-in corr()/stddev() whose accumulation order varies
    // with partitioning. One partial-agg shuffle; moments compose, so the
    // map-side combine does almost all the work at any scale.
    "q73_exact_moments" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val agg = li.select(col("l_returnflag"),
            col("l_quantity").cast("long").as("x"),
            expr("CAST(round(l_discount * 100) AS LONG)").as("y"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        agg.select(col("l_returnflag"), col("n"),
          round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6).as("corr_qty_disc"),
          round(sqrt(((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            / (col("n") * (col("n") - 1)).cast("double")), 6).as("stddev_qty"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
                 CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
                 CAST(sum(CAST(l_quantity AS BIGINT)
                          * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy,
                 CAST(sum(CAST(l_quantity AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
                 CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                          * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_qty_disc,
               round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE)), 6) AS stddev_qty
        FROM m""")),

    // Distribution ranking: spend deciles with percent_rank / cume_dist
    // over a tie-broken total order. A global `Window.orderBy` would pull
    // every per-customer aggregate through ONE task; instead the exact
    // rank comes from the two-pass range-partitioned operator
    // (`Relational.withGlobalRank` — terasort layout + partition-offset
    // join, largest task = one range partition), and ntile / percent_rank
    // / cume_dist reduce to closed-form integer arithmetic over (rank, n)
    // because the order key is tie-free (includes the customer id):
    // ntile fills the first n%10 buckets with one extra row; percent_rank
    // = (rank-1)/(n-1); cume_dist = rank/n.
    "q74_spend_deciles" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val totals = orders
          .select(col("o_custkey"),
            expr("CAST(round(o_totalprice * 100) AS LONG)").as("cents"))
          .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
        val (ranked, n) = graft.operators.Relational.withGlobalRankN(totals,
          Seq(col("cents").desc, col("o_custkey")), "__rank")
        val r = col("__rank")
        val decile = graft.operators.Relational.ntileFromRank(r, n, 10)
        ranked.select(col("o_custkey"),
          round(col("cents") / 100.0, 2).as("total_spend"),
          decile.cast("long").as("decile"),
          round(if (n == 1) lit(0.0)
            else (r - 1).cast("double") / lit((n - 1).toDouble), 6)
            .as("pct_rank"),
          round(r.cast("double") / lit(n.toDouble), 6).as("cume"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM orders GROUP BY o_custkey)
        SELECT o_custkey, round(cents / 100.0, 2) AS total_spend,
               ntile(10) OVER w AS decile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM t WINDOW w AS (ORDER BY cents DESC, o_custkey)""")),

    // Calendar-spine resample: daily revenue over a month INCLUDING the
    // zero-order days — the gap-filling join every time-series feature
    // pipeline needs (a groupBy alone silently drops empty days). The
    // spine is generated, tiny, and broadcast; the fact side aggregates
    // before joining, so the outer join is day-cardinality.
    "q87_calendar_spine" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val spine = s.range(1).select(explode(expr(
          "sequence(to_date('1996-01-01'), to_date('1996-01-31'), interval 1 day)"))
          .as("d"))
        val rev = orders
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(o_totalprice * 100) AS LONG)")).as("cents"))
        spine.join(rev, Seq("d"), "left")
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
            coalesce(col("n"), lit(0L)).as("n_orders"),
            round(coalesce(col("cents"), lit(0L)) / 100.0, 2).as("revenue"))
      },
      oracle = Some("""
        WITH spine AS (
          SELECT CAST(unnest(generate_series(DATE '1996-01-01',
                   DATE '1996-01-31', INTERVAL 1 DAY)) AS DATE) AS d),
        r AS (
          SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-02-01'
          GROUP BY 1)
        SELECT strftime(s.d, '%Y-%m-%d') AS day,
               coalesce(n, 0) AS n_orders,
               round(coalesce(cents, 0) / 100.0, 2) AS revenue
        FROM spine s LEFT JOIN r USING (d)""")),

    // Heavy-hitter profiling: the top-20 join keys by row share — the
    // skew diagnosis a pipeline runs before choosing salting/broadcast
    // strategies (feeds Relational.saltedJoin's factor). Partial-agg
    // shuffle + TakeOrderedAndProject (per-partition top-k heaps, no
    // global sort); the total is a broadcast scalar.
    "q78_heavy_hitters" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val counts = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
        val total = li.agg(count(lit(1)).as("total"))
        counts.crossJoin(broadcast(total))
          .select(col("l_partkey"), col("n"),
            round(col("n").cast("double") / col("total"), 6).as("share"))
          .orderBy(col("n").desc, col("l_partkey")).limit(20)
      },
      oracle = Some("""
        SELECT l_partkey, count(*) AS n,
               round(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM lineitem), 6) AS share
        FROM lineitem GROUP BY l_partkey
        ORDER BY n DESC, l_partkey LIMIT 20""")),

    // Deterministic mode: the most frequent priority per order status,
    // ties broken alphabetically — built-in mode() is tie-arbitrary on
    // both engines, so the engine-stable form is count + rank.
    "q79_mode_priority" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("n").desc, col("o_orderpriority"))
        orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"),
            col("o_orderpriority").as("mode_priority"), col("n"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY count(*) DESC, o_orderpriority) AS rn
          FROM orders GROUP BY o_orderstatus, o_orderpriority)
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM c WHERE rn = 1""")),

    // Basket co-occurrence: top-20 part pairs purchased together — the
    // self-join-within-group shape (recommendations, co-citation). The
    // pair space explodes within orders only (~n_items² per order, never
    // |lineitem|²). Instead of a self-JOIN (which shuffles the table
    // twice and probes a hash relation), one groupBy collects each
    // order's distinct sorted parts and a codegen'd nested transform
    // emits the i<j combinations — one fewer exchange at any scale
    // (sf0.1 wall-clock is pair-count-shuffle-bound either way). Per-
    // order baskets are small (the array stays KBs); the pair count
    // shuffle pre-combines map-side, then per-partition top-k heaps.
    "q89_copurchase_pairs" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        // pre-partition on the group key: map-side partial collect_list
        // reduces NOTHING (lists concatenate, data volume is identical),
        // so the explicit exchange satisfies the groupBy's distribution
        // and pushes all list-building past the shuffle — off the scan
        // tasks, 32-way instead of per-input-split. Same single shuffle.
        // Adjudicated r6 (8-rep A/B at sf0.1, same host load): WITH the
        // exchange 0.91 s median vs 1.18 s without; the r5 "regression"
        // (1.83 s) was the async-unpersist backlog, fixed in Checkpoints,
        // not this exchange.
        li.repartition(col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(array_sort(array_distinct(collect_list(col("l_partkey"))))
            .as("parts"))
          .filter(size(col("parts")) >= 2)
          // pairs ride the shuffle as ONE packed long (a<<32 | b): the
          // 3M-row count exchange carries 8-byte keys, and (n desc, pack)
          // orders exactly like (n desc, part_a, part_b); the expansion
          // itself is the native PairPackExplode generator
          .select(pairPack(col("parts")).as("pack"))
          .groupBy(col("pack")).agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("pack"))
          .limit(20)
          .select(shiftright(col("pack"), 32).as("part_a"),
            col("pack").bitwiseAND(lit(0xFFFFFFFFL)).as("part_b"),
            col("n_orders"))
      },
      oracle = Some("""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 20"""),
      headline = true),

    // Cohort retention: customers by first-order month × months since,
    // the classic retention triangle. Month arithmetic runs on exact
    // (year*12 + month) integers — no float date math to diverge. Two
    // hash shuffles (first-order month, then the cohort cells).
    "q90_cohort_retention" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"))
        val first = orders.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("m0"))
        orders.join(first, "o_custkey")
          .select(col("o_custkey"), col("m0"), (col("m") - col("m0")).as("k"))
          .groupBy(col("m0"), col("k"))
          .agg(countDistinct(col("o_custkey")).as("n_customers"))
          .filter(col("k") <= 12)
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
          FROM orders),
        f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey)
        SELECT m0, m - m0 AS k, count(DISTINCT o.o_custkey) AS n_customers
        FROM o JOIN f USING (o_custkey)
        WHERE m - m0 <= 12
        GROUP BY m0, m - m0""")),

    // Trailing-window anomaly score: each day's revenue as a z-score
    // against its own trailing 28 days (RANGE frame over day numbers, so
    // calendar gaps are handled) — the drift monitor over any ingest
    // metric. Stats come from integer moment sums inside the window
    // (daily totals coarsened to whole dollars by integer division —
    // identical on both engines; keeps Σx² within long range through
    // ~sf1), so mean/std are fixed-order float math, not accumulation-
    // order-dependent. Days with under 8 trailing observations emit null.
    "q95_revenue_anomaly" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val daily = orders
          .groupBy(datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .as("day"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS LONG)")).as("cents"))
          .withColumn("dd", expr("CAST(cents DIV 100 AS LONG)"))
        val w = Window.orderBy(col("day")).rangeBetween(-27, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("dd")).over(w))
          .withColumn("sxx", sum(col("dd") * col("dd")).over(w))
          .select(
            date_format(expr("date_add(DATE '1970-01-01', day)"), "yyyy-MM-dd")
              .as("day"),
            round(col("cents") / 100.0, 2).as("revenue"),
            when(col("n") >= 8 && (col("n") * col("sxx") > col("sx") * col("sx")),
              round((col("dd") - col("sx").cast("double") / col("n"))
                / sqrt(((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double")) / (col("n") * (col("n") - 1)).cast("double")),
                4)).as("zscore"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM orders GROUP BY 1),
        d2 AS (SELECT day, cents, cents // 100 AS dd FROM daily),
        win AS (
          SELECT day, cents, dd,
                 count(*) OVER w AS n,
                 CAST(sum(dd) OVER w AS BIGINT) AS sx,
                 CAST(sum(dd * dd) OVER w AS BIGINT) AS sxx
          FROM d2
          WINDOW w AS (ORDER BY day RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
        SELECT strftime(DATE '1970-01-01' + to_days(CAST(day AS INTEGER)),
                        '%Y-%m-%d') AS day,
               round(cents / 100.0, 2) AS revenue,
               CASE WHEN n >= 8 AND n * sxx > sx * sx THEN
                 round((dd - CAST(sx AS DOUBLE) / n)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE)), 4)
               END AS zscore
        FROM win""")),

    // Column profile: per-column null counts and distinct cardinalities
    // in ONE aggregation pass (count(col) skips nulls; the unpivot to
    // rows happens after the scalar agg, so the scan is read once) — the
    // schema-health report an ingest emits per batch.
    "q92_null_profile" -> QueryDef(
      build = (s, dir) => {
        val ev = Engine.table(s, dir, "events")
        val cols = Seq("event_id", "user_id", "event_type", "value", "props")
        val agg = ev.agg(count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"))): _*)
        agg.select(explode(array(cols.map(c => struct(
            lit(c).as("column"), col("n_rows"),
            (col("n_rows") - col(s"nn_$c")).as("n_null"),
            col(s"nd_$c").as("n_distinct"))): _*)).as("r"))
          .select(col("r.column"), col("r.n_rows"), col("r.n_null"),
            col("r.n_distinct"))
      },
      oracle = Some("""
        WITH a AS (
          SELECT count(*) AS n_rows,
                 count(event_id) AS nn1, count(DISTINCT event_id) AS nd1,
                 count(user_id) AS nn2, count(DISTINCT user_id) AS nd2,
                 count(event_type) AS nn3, count(DISTINCT event_type) AS nd3,
                 count(value) AS nn4, count(DISTINCT value) AS nd4,
                 count(props) AS nn5, count(DISTINCT props) AS nd5
          FROM events)
        SELECT 'event_id' AS "column", n_rows, n_rows - nn1 AS n_null, nd1 AS n_distinct FROM a
        UNION ALL
        SELECT 'user_id', n_rows, n_rows - nn2, nd2 FROM a
        UNION ALL
        SELECT 'event_type', n_rows, n_rows - nn3, nd3 FROM a
        UNION ALL
        SELECT 'value', n_rows, n_rows - nn4, nd4 FROM a
        UNION ALL
        SELECT 'props', n_rows, n_rows - nn5, nd5 FROM a""")),

    // Histogram profiling: fixed-width price buckets — the data-profiling
    // pass a pipeline runs before choosing partition/skew strategies.
    "q56_price_histogram" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        orders.groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_orders"),
            round(min(col("o_totalprice")), 2).as("lo"),
            round(max(col("o_totalprice")), 2).as("hi"))
      },
      oracle = Some("""
        SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM orders GROUP BY 1""")),

    // Exact per-group OLS (n_chars ~ token count per language): slope and
    // intercept from integer sums only — one partial-agg shuffle, results
    // independent of accumulation order and engine (q73's moments
    // pattern; the single float division happens once per GROUP).
    "q103_ols_by_lang" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val agg = d.select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("x"),
            col("n_chars").as("y"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
        val det = (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double")
        agg.select(col("lang"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / det, 6).as("slope"),
          round((col("sxx") * col("sy") - col("sx") * col("sxy")).cast("double")
            / det, 6).as("intercept"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT lang, count(*) AS n,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sx,
                 CAST(sum(n_chars) AS BIGINT) AS sy,
                 CAST(sum(len(string_split(text, ' ')) * n_chars) AS BIGINT) AS sxy,
                 CAST(sum(len(string_split(text, ' '))
                          * len(string_split(text, ' '))) AS BIGINT) AS sxx
          FROM documents GROUP BY lang)
        SELECT lang, n,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
               round(CAST(sxx * sy - sx * sxy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
        FROM m""")),

    // Relative-standing analytics: percent_rank and cume_dist of each
    // customer inside their market segment by account balance. NOT a
    // window partitioned by segment (5 segments → each window partition
    // is 1/5 of all customers at any scale): the exact per-stratum rank
    // and count come from the two-pass withStratumRankN, and both stats
    // are closed-form map-side arithmetic on (rank, n). The order is
    // tie-free (custkey breaks balance ties), so percent_rank =
    // (rank−1)/(n−1) and cume_dist = rank/n — the identical IEEE
    // divisions both engines fold the same way.
    "q104_percent_rank" -> QueryDef(
      build = (s, dir) => {
        val c = Engine.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val r = graft.operators.Relational.withStratumRankN(c,
          Seq("c_mktsegment"), Seq(col("c_acctbal"), col("c_custkey")),
          as = "__rnk", nAs = "__n")
        r.select(col("c_custkey"), col("c_mktsegment"),
          round(when(col("__n") === 1, lit(0.0))
            .otherwise((col("__rnk") - 1).cast("double") / (col("__n") - 1)),
            6).as("pr"),
          round(col("__rnk").cast("double") / col("__n"), 6).as("cd"))
      },
      oracle = Some("""
        SELECT c_custkey, c_mktsegment,
               round(percent_rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS pr,
               round(cume_dist() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS cd
        FROM customer""")),

    // Unpivot (wide→long melt): per-returnflag metric columns stacked to
    // (flag, metric, value) rows — Spark's unpivot/stack is a zero-
    // shuffle projection over the one-exchange aggregate feeding it.
    "q106_unpivot" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            ExactAgg.sumExact(col("l_extendedprice"), 2).as("sum_price"),
            ExactAgg.avgExact(col("l_discount"), 6).as("avg_disc"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
            "metric", "value")
      },
      oracle = Some(s"""
        WITH a AS (
          SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
                 ${ExactAgg.sqlSum("l_extendedprice", 2)} AS sum_price,
                 ${ExactAgg.sqlAvg("l_discount", 6)} AS avg_disc
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM a
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM a""")),

    // Median absolute deviation per group — the robust dispersion stat
    // outlier gates use where stddev is skew-poisoned. Two percentile
    // passes (median, then median of |x−median|); the per-group medians
    // ride a broadcast back onto the scan. Interpolation matches
    // DuckDB's quantile_cont (pinned by q46).
    "q109_mad_robust" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val med = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, 0.5D)").as("med"))
        li.join(broadcast(med), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(abs(l_extendedprice - med), 0.5D)").as("m"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("n"), round(col("m"), 4).as("mad"))
      },
      oracle = Some("""
        WITH med AS (
          SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, count(*) AS n,
               round(quantile_cont(abs(l_extendedprice - med), 0.5), 4) AS mad
        FROM lineitem JOIN med USING (l_returnflag)
        GROUP BY l_returnflag""")),

    // Triangle counting on the co-purchase graph (edges = part pairs
    // co-ordered ≥2 times, oriented a<b<c) — the standard distributed
    // compact-forward shape: two self equi-joins over the oriented edge
    // list, so wedge fan-out is bounded by forward-degree and the whole
    // thing is hash shuffles on node keys. Per-node participation counts
    // via a 3-way union, exact integers.
    "q110_triangle_count" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .agg(count(lit(1)).as("n"))
          .where(col("n") >= 2)
          .select(col("pa"), col("pb"))
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.pb") === col("e2.pa"))
          .join(e.as("e3"), col("e3.pa") === col("e1.pa") &&
            col("e3.pb") === col("e2.pb"))
          .select(col("e1.pa").as("x"), col("e1.pb").as("y"),
            col("e2.pb").as("z"))
        tri.select(col("x").as("node"))
          .unionAll(tri.select(col("y").as("node")))
          .unionAll(tri.select(col("z").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
          .orderBy(col("n_triangles").desc, col("node")).limit(30)
      },
      oracle = Some("""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        tri AS (
          SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
          FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        nodes AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        SELECT node, count(*) AS n_triangles FROM nodes GROUP BY node
        ORDER BY n_triangles DESC, node LIMIT 30""")),

    // Item-item collaborative-filtering similarity: cosine over customer
    // co-occurrence, sim(a,b) = n_ab / √(n_a·n_b). The pair expansion
    // rides the native PairPackExplode generator over per-customer
    // sorted part baskets (q89's packed-long trick — the big shuffle
    // carries 8-byte keys); per-item customer counts broadcast back onto
    // the pair table. Single float op chain per pair → deterministic.
    "q111_item_similarity" -> QueryDef(
      build = (s, dir) => {
        val bought = Engine.table(s, dir, "lineitem")
          .join(Engine.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .distinct()
        val nPer = bought.groupBy(col("part"))
          .agg(count(lit(1)).as("n_cust"))
        val pairs = bought
          .repartition(col("cust")).groupBy(col("cust"))
          .agg(array_sort(collect_list(col("part"))).as("parts"))
          .filter(size(col("parts")) >= 2)
          .select(pairPack(col("parts")).as("pack"))
          .groupBy(col("pack")).agg(count(lit(1)).as("n_ab"))
          .where(col("n_ab") >= 3)
          .select(shiftright(col("pack"), 32).as("part_a"),
            col("pack").bitwiseAND(lit(0xFFFFFFFFL)).as("part_b"),
            col("n_ab"))
        pairs
          .join(broadcast(nPer.withColumnRenamed("part", "part_a")
            .withColumnRenamed("n_cust", "na")), "part_a")
          .join(broadcast(nPer.withColumnRenamed("part", "part_b")
            .withColumnRenamed("n_cust", "nb")), "part_b")
          .select(col("part_a"), col("part_b"), col("n_ab"),
            round(col("n_ab").cast("double") /
              sqrt((col("na") * col("nb")).cast("double")), 6).as("sim"))
          .orderBy(col("sim").desc, col("part_a"), col("part_b"))
          .limit(20)
      },
      oracle = Some("""
        WITH bp AS (
          SELECT DISTINCT o_custkey AS cust, l_partkey AS part
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        n AS (SELECT part, count(*) AS n_cust FROM bp GROUP BY part),
        pc AS (
          SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_ab
          FROM bp a JOIN bp b ON a.cust = b.cust AND a.part < b.part
          GROUP BY 1, 2 HAVING count(*) >= 3)
        SELECT part_a, part_b, n_ab,
               round(CAST(n_ab AS DOUBLE)
                 / sqrt(CAST(na.n_cust * nb.n_cust AS DOUBLE)), 6) AS sim
        FROM pc JOIN n na ON na.part = pc.part_a
                JOIN n nb ON nb.part = pc.part_b
        ORDER BY sim DESC, part_a, part_b LIMIT 20""")),

    // 8-tap exponentially-weighted moving average (half-life 1 day) of
    // daily order revenue per priority — the smoothed trend monitor.
    // Finite taps spelled as explicit lag() terms: every product is an
    // integer-cents value times an exact power of two, so each term and
    // the left-to-right sum are EXACT doubles — bit-identical on any
    // engine, any partitioning. Only full-window rows (rn ≥ 8) emit.
    "q113_ewma_revenue" -> QueryDef(
      build = (s, dir) => {
        val o = Engine.table(s, dir, "orders")
        val day = o.groupBy(col("o_orderpriority"), col("o_orderdate"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS LONG)"))
            .as("cents"))
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderdate"))
        val taps = (0 to 7).map(k =>
          lag(col("cents"), k).over(w).cast("double") / math.pow(2.0, k))
        day
          .withColumn("rn", row_number().over(w))
          .withColumn("ewma_cents",
            taps.reduce(_ + _) / (2.0 - math.pow(2.0, -7)))
          .where(col("rn") >= 8)
          .select(col("o_orderpriority"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
            (col("cents").cast("double") / 100).as("revenue"),
            round(col("ewma_cents") / 100, 4).as("ewma"))
      },
      oracle = Some("""
        WITH day AS (
          SELECT o_orderpriority, o_orderdate,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        l AS (
          SELECT o_orderpriority, o_orderdate, cents,
                 row_number() OVER w AS rn,
                 CAST(lag(cents, 0) OVER w AS DOUBLE) / 1
                 + CAST(lag(cents, 1) OVER w AS DOUBLE) / 2
                 + CAST(lag(cents, 2) OVER w AS DOUBLE) / 4
                 + CAST(lag(cents, 3) OVER w AS DOUBLE) / 8
                 + CAST(lag(cents, 4) OVER w AS DOUBLE) / 16
                 + CAST(lag(cents, 5) OVER w AS DOUBLE) / 32
                 + CAST(lag(cents, 6) OVER w AS DOUBLE) / 64
                 + CAST(lag(cents, 7) OVER w AS DOUBLE) / 128 AS s
          FROM day
          WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
        SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(cents AS DOUBLE) / 100 AS revenue,
               round(s / (2.0 - 1.0 / 128) / 100, 4) AS ewma
        FROM l WHERE rn >= 8""")),

    // Declarative data-quality audit (Deequ-style expectations): four
    // named constraints evaluated in ONE scan — each rule is a
    // conditional count inside a single scalar aggregate, unpivoted to
    // the per-rule violation report a pipeline gates deploys on.
    "q121_quality_audit" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        graft.operators.Conform.audit(li, Seq(
          "discount_le_5pct" -> (col("l_discount") <= 0.05),
          "price_min_1000" -> (col("l_extendedprice") >= 1000.0),
          "quantity_le_40" -> (col("l_quantity") <= 40.0),
          "tax_le_6pct" -> (col("l_tax") <= 0.06)))
      },
      oracle = Some("""
        WITH c AS (
          SELECT count(*) AS n,
                 count(*) FILTER (NOT (l_discount <= 0.05)) AS r1,
                 count(*) FILTER (NOT (l_extendedprice >= 1000.0)) AS r2,
                 count(*) FILTER (NOT (l_quantity <= 40.0)) AS r3,
                 count(*) FILTER (NOT (l_tax <= 0.06)) AS r4
          FROM lineitem)
        SELECT 'discount_le_5pct' AS rule, r1 AS n_violations,
               round(CAST(r1 AS DOUBLE) / n, 6) AS violation_rate FROM c
        UNION ALL SELECT 'price_min_1000', r2,
               round(CAST(r2 AS DOUBLE) / n, 6) FROM c
        UNION ALL SELECT 'quantity_le_40', r3,
               round(CAST(r3 AS DOUBLE) / n, 6) FROM c
        UNION ALL SELECT 'tax_le_6pct', r4,
               round(CAST(r4 AS DOUBLE) / n, 6) FROM c""")),

    // EXACT per-stratum quartiles without `percentile`'s per-group
    // value buffer: Spark's exact percentile aggregate materializes
    // every group value in executor memory — at 100 TB the English
    // group IS the corpus, so that buffer is the straggler/OOM the
    // stratum-window family already paid for. Nearest-rank quartiles
    // need only (rank, n) per stratum, which the two-pass
    // withStratumRankN computes range-partitioned; the rank targets
    // are pure INTEGER arithmetic ((n+3) DIV 4 etc.) — ceil without a
    // single float. Conditional max picks the ranked value map-side.
    "q158_stratum_quartiles" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Relational
        val d = Engine.table(s, dir, "documents")
          .select(col("lang"), col("n_chars"), col("doc_id"))
        val ranked = Relational.withStratumRankN(d, Seq("lang"),
          Seq(col("n_chars"), col("doc_id")), as = "__rnk", nAs = "__n")
        ranked.groupBy(col("lang"))
          .agg(
            max(when(col("__rnk") === expr("(__n + 3) DIV 4"),
              col("n_chars"))).as("p25"),
            max(when(col("__rnk") === expr("(__n + 1) DIV 2"),
              col("n_chars"))).as("p50"),
            max(when(col("__rnk") === expr("(3 * __n + 3) DIV 4"),
              col("n_chars"))).as("p75"),
            max(col("__n")).as("n_docs"))
      },
      oracle = Some("""
        WITH r AS (
          SELECT lang, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS rnk,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT lang,
               max(CASE WHEN rnk = (n + 3) // 4 THEN n_chars END) AS p25,
               max(CASE WHEN rnk = (n + 1) // 2 THEN n_chars END) AS p50,
               max(CASE WHEN rnk = (3 * n + 3) // 4 THEN n_chars END) AS p75,
               CAST(max(n) AS BIGINT) AS n_docs
        FROM r GROUP BY lang"""))
  )
}
