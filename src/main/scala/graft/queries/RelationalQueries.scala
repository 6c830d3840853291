package graft.queries

import graft.Engine
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2–§2.6) expressed over the
  * driver's TPC-H-ish tables. Each query carries a DuckDB oracle.
  *
  * Determinism rules shared with every oracle in this repo:
  *  - double aggregates are round()ed identically on both sides;
  *  - output never exposes raw timestamps (strings/epochs instead);
  *  - ties are always broken by a unique key.
  */
object RelationalQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // A1/A2 hash aggregate with partial (map-side) combine; no shuffle
    // beyond the single agg exchange. TPC-H Q1 shape.
    "q01_agg_pricing_summary" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 4).as("sum_qty"), // integer-valued: exact in any order
            ExactAgg.sumExact(col("l_extendedprice"), 2).as("sum_base_price"),
            ExactAgg.sumExact(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               ${ExactAgg.sqlSum("l_extendedprice", 2)} AS sum_base_price,
               ${ExactAgg.sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""),
      headline = true),

    // P1/F-family: projection + conjunctive predicates; all three
    // predicates push to the parquet scan (PushedFilters), projection
    // prunes to 5 of 11 columns (ReadSchema).
    "q02_filter_project" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.filter(col("l_quantity") < 10 && col("l_discount") > 0.05 &&
            col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1.0 - l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_quantity < 10 AND l_discount > 0.05 AND l_returnflag = 'R'"""),
      headline = true),

    // J1 broadcast equi-join (dim customer broadcasts; fact orders never
    // shuffles) + hash agg.
    "q03_join_agg_segment" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val cust = Engine.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            ExactAgg.sumExact(col("o_totalprice"), 2).as("total_price"))
      },
      oracle = Some(s"""
        SELECT c_mktsegment, count(*) AS n_orders,
               ${ExactAgg.sqlSum("o_totalprice", 2)} AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment"""),
      headline = true),

    // J1×3: star join — every dim broadcasts, lineitem is the only big
    // input and is read once with column pruning. TPC-H Q5 shape.
    "q04_star_join_revenue" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        val sup = Engine.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nat = Engine.table(s, dir, "nation")
        val reg = Engine.table(s, dir, "region")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(ExactAgg.sumExact(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      oracle = Some(s"""
        SELECT r_name, n_name,
               ${ExactAgg.sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name"""),
      headline = true),

    // J6 left-semi (EXISTS): membership without multiplying rows.
    "q05_semi_join_active_customers" -> QueryDef(
      build = (s, dir) => {
        val cust = Engine.table(s, dir, "customer")
        val orders = Engine.table(s, dir, "orders").select(col("o_custkey"))
        cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // J5-shape anti-join (NOT EXISTS).
    "q06_anti_join_inactive_customers" -> QueryDef(
      build = (s, dir) => {
        val cust = Engine.table(s, dir, "customer")
        val orders = Engine.table(s, dir, "orders").select(col("o_custkey"))
        cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // J5 exact-duplicate suppression gate (database_utils.py:128-145):
    // incoming rows whose (partkey, suppkey, quantity) already exist in
    // the "warehouse" slice are dropped — one anti-join, zero per-row
    // probes. Survivor counts grouped for a compact deterministic output.
    "q07_dedup_gate" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val existing = li.filter(col("l_linenumber") <= 2)
        val incoming = li.filter(col("l_linenumber") >= 3)
        Relational.dedupGate(incoming, existing,
            Seq("l_partkey", "l_suppkey", "l_quantity"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("survivors"),
            ExactAgg.sumExact(col("l_extendedprice"), 2).as("survivor_price"))
      },
      oracle = Some(s"""
        SELECT l_returnflag, count(*) AS survivors,
               ${ExactAgg.sqlSum("l_extendedprice", 2)} AS survivor_price
        FROM lineitem i
        WHERE l_linenumber >= 3 AND NOT EXISTS (
          SELECT 1 FROM lineitem e
          WHERE e.l_linenumber <= 2 AND e.l_partkey = i.l_partkey
            AND e.l_suppkey = i.l_suppkey AND e.l_quantity = i.l_quantity)
        GROUP BY l_returnflag"""),
      headline = true),

    // J4 get-or-create dim upsert: existing dim = priorities seen on
    // orderkey%10=0 orders (ids by natural-key order); incoming = all
    // priorities; new keys get max(existing id)+row_number.
    "q08_dim_upsert" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val existing = orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderpriority").as("priority")).dropDuplicates("priority")
          .withColumn("dim_id",
            row_number().over(Window.orderBy(col("priority"))).cast("long"))
        val incoming = orders.select(col("o_orderpriority").as("priority"))
        Relational.dimUpsert(existing, incoming, "priority", "dim_id")
      },
      oracle = Some("""
        WITH existing AS (
          SELECT priority, CAST(row_number() OVER (ORDER BY priority) AS BIGINT) AS dim_id
          FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders
                WHERE o_orderkey % 10 = 0)
        ), fresh AS (
          SELECT DISTINCT o_orderpriority AS priority FROM orders
          WHERE o_orderpriority NOT IN (SELECT priority FROM existing)
        )
        SELECT priority, dim_id FROM existing
        UNION ALL
        SELECT priority,
               CAST(row_number() OVER (ORDER BY priority) AS BIGINT)
                 + (SELECT coalesce(max(dim_id), 0) FROM existing) AS dim_id
        FROM fresh""")),

    // W1 forward-fill (unbounded last non-null) — the Spark restatement of
    // the reference's previous_link carry (import_files_to_postgre.py:143-153).
    "q09_window_forward_fill" -> QueryDef(
      build = (s, dir) => {
        val ev = Engine.table(s, dir, "events")
          .withColumn("v", when(col("event_type") =!= "error", col("value")))
        Relational.forwardFill(ev, col("v"), Seq(col("user_id")),
            Seq(col("event_id")), "filled")
          .select(col("event_id"), col("user_id"), round(col("filled"), 4).as("filled"))
      },
      oracle = Some("""
        SELECT event_id, user_id,
               round(last_value(CASE WHEN event_type != 'error' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
        FROM events"""),
      headline = true),

    // W1 faithful one-row-lookback variant (lag, not last — SURVEY §7.3):
    // a blank inherits only from the immediately-previous row.
    "q10_window_lag_fill" -> QueryDef(
      build = (s, dir) => {
        val ev = Engine.table(s, dir, "events")
          .withColumn("link", when(col("event_type") === "click", col("props")))
        Relational.fillFromPrevious(ev, col("link"), Seq(col("user_id")),
            Seq(col("event_id")), "filled_link")
          .select(col("event_id"), col("user_id"), col("filled_link"))
      },
      oracle = Some("""
        SELECT event_id, user_id,
               coalesce(lnk, lag(lnk, 1) OVER (PARTITION BY user_id ORDER BY event_id))
                 AS filled_link
        FROM (SELECT event_id, user_id,
                     CASE WHEN event_type = 'click' THEN props END AS lnk
              FROM events)""")),

    // W2 row_number tie-break — deterministic ".iloc[0]" per key.
    // Aggregation form (min_by over a packed sort key) instead of the
    // window form: map-side partial reduction shrinks the shuffle to ~one
    // row per key and drops the per-partition sort (Relational
    // .firstPerKeyAgg; the window twin is pinned equivalent in
    // OperatorsSpec). Bit budget of the packed key: l_linenumber < 2^15,
    // l_partkey < 2^28 (20M parts at sf100 fits), l_suppkey < 2^20.
    "q11_first_per_key" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // (…, l_partkey, l_suppkey) is — the order must be total for a
        // deterministic "first".
        val packedOrd = col("l_linenumber").cast("long") * lit(1L << 48) +
          col("l_partkey").cast("long") * lit(1L << 20) +
          col("l_suppkey").cast("long")
        Relational.firstPerKeyAgg(li, Seq(col("l_orderkey")), packedOrd,
          Seq(col("l_partkey"), col("l_quantity")))
      },
      oracle = Some("""
        SELECT l_orderkey, l_partkey, l_quantity FROM (
          SELECT l_orderkey, l_partkey, l_quantity,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
          FROM lineitem) WHERE rn = 1"""),
      headline = true),

    // Top-k with rounded sort key + unique tie-break (TakeOrderedAndProject
    // physical op — no global sort at scale).
    "q12_topk_customers" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        orders.groupBy(col("o_custkey"))
          .agg(ExactAgg.sumExact(col("o_totalprice"), 2).as("total"))
          .orderBy(col("total").desc, col("o_custkey").asc)
          .limit(10)
      },
      oracle = Some(s"""
        SELECT o_custkey, ${ExactAgg.sqlSum("o_totalprice", 2)} AS total
        FROM orders GROUP BY o_custkey
        ORDER BY total DESC, o_custkey ASC LIMIT 10""")),

    // Set op: EXCEPT (distinct) — customers with only 'F' orders.
    "q13_set_except" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
        val f = orders.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
        val o = orders.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        f.except(o)
      },
      oracle = Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")),

    // Range (interval-containment) join, bucketized: sampled orders open
    // a 7-day shipping window; lineitems landing inside pair up through
    // an equi-join on the week bin + exact containment filter — no
    // nested-loop (see Relational.rangeJoin).
    "q45_range_join" -> QueryDef(
      build = (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val li = Engine.table(s, dir, "lineitem")
          .select(datediff(col("l_shipdate"), epoch).as("ship_day"),
            col("l_quantity"))
        val iv = Engine.table(s, dir, "orders")
          .filter(col("o_orderkey") % 199 === 0)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"), epoch).as("start_day"))
          .withColumn("end_day", col("start_day") + 6)
        Relational.rangeJoin(li, iv, "ship_day", "start_day", "end_day",
            binSize = 7)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_shipped"),
            round(sum(col("l_quantity")), 4).as("qty"))
      },
      oracle = Some("""
        SELECT o_orderkey, count(*) AS n_shipped,
               round(sum(l_quantity), 4) AS qty
        FROM lineitem
        JOIN (SELECT o_orderkey,
                     date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS s
              FROM orders WHERE o_orderkey % 199 = 0) iv
          ON date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)
             BETWEEN iv.s AND iv.s + 6
        GROUP BY o_orderkey""")),

    // Exact interpolated percentiles (engine analytics extension): both
    // engines sort and linearly interpolate, so values agree to rounding.
    "q46_percentiles" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
            .as("ps"))
          .select(col("l_returnflag"),
            round(element_at(col("ps"), 1), 4).as("p25"),
            round(element_at(col("ps"), 2), 4).as("p50"),
            round(element_at(col("ps"), 3), 4).as("p75"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag""")),

    // HLL++ approximate distinct (north-star sketch surface, SURVEY.md
    // §2.10): sketch values differ across engines, so the estimate itself
    // can't hash-compare — instead the output carries the exact NDV plus
    // a within-3σ flag on the estimate. Spark's HLL++ is deterministic,
    // so the flag is stable, and the oracle asserts it TRUE: the sketch
    // is exercised AND bounded, not just row-counted. (The exact
    // count(DISTINCT) rides along only for the oracle; at 100 TB the
    // sketch replaces it — that's its purpose.)
    "q47_approx_distinct" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02)
            .as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
            (abs(col("approx_parts") - col("exact_parts"))
              <= col("exact_parts") * lit(0.06)).as("within_bounds"))
      },
      oracle = Some("""
        SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
               count(*) AS n_rows, TRUE AS within_bounds
        FROM lineitem GROUP BY l_returnflag""")),

    // Full outer join: the daily reconciliation shape — activity per day
    // from two independent feeds, keeping days that exist in only one.
    // Both inputs are pre-aggregated (per-day counts), so the outer join
    // runs over day cardinality, not row cardinality — at 100 TB the
    // join is still thousands of rows. Events `ts` is TimestampType (see
    // Engine.normalizeEventTs); days render as strings for cross-engine
    // hashing.
    "q80_full_outer_reconcile" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_orders"))
        val events = Engine.table(s, dir, "events")
          .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"))
        orders.join(events, Seq("day"), "full_outer")
          .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders
          FROM orders GROUP BY 1),
        e AS (
          SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 count(*) AS n_events
          FROM events GROUP BY 1)
        SELECT coalesce(o.day, e.day) AS day,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(n_events, 0) AS n_events
        FROM o FULL OUTER JOIN e ON o.day = e.day""")),

    // Skew-salted join, gate-checked: revenue per priority through
    // Relational.saltedJoin (hot keys spread over 8 shuffle partitions,
    // build side replicated 8×) — the oracle is the PLAIN join, proving
    // salting is invisible to results. The aggregate runs in exact cents.
    "q82_salted_join_agg" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_orderkey"),
            expr("CAST(round(l_extendedprice * 100) AS LONG)").as("cents"))
        val o = Engine.table(s, dir, "orders")
          .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority")
        Relational.saltedJoin(li, o, Seq("l_orderkey"), saltFactor = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("cents")) / 100.0, 2).as("revenue"))
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n_items,
               round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) / 100.0, 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""")),

    // Bloom-pruned join, gate-checked: lineitem is pre-filtered by a
    // bloom filter built on the selective build side's keys before the
    // join shuffle (Engine.bloomPrune). One-sided filter → the oracle is
    // the plain join: false positives are re-checked by the join itself,
    // false negatives cannot exist, so results match exactly.
    "q83_bloom_join_agg" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val o = Engine.table(s, dir, "orders")
          .filter(col("o_totalprice") > 400000)
          .selectExpr("o_orderkey AS l_orderkey", "o_orderstatus")
        val pruned = Engine.bloomPrune(li, col("l_orderkey"), o, col("l_orderkey"))
        pruned.join(o, Seq("l_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_quantity")), 4).as("qty"))
      },
      oracle = Some("""
        SELECT o_orderstatus, count(*) AS n_items,
               round(sum(l_quantity), 4) AS qty
        FROM lineitem
        JOIN (SELECT o_orderkey, o_orderstatus FROM orders
              WHERE o_totalprice > 400000) o ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus""")),

    // Incremental aggregate maintenance, gate-checked: three batch
    // states folded out of order, finished at read time — the oracle is
    // the plain one-shot aggregate, proving the decomposed fold is
    // invisible to results (Relational.aggState/mergeAggState).
    // Per-key top-k through the custom whole-operator stack (logical
    // node + strategy + bounded-heap exec; plans/TopKPerKey.scala): the
    // top-5 line items per supplier by price. The window form the oracle
    // uses sorts every 600-row supplier group; the operator keeps 5.
    "q105_topk_per_supplier" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        Relational.topKPerKey(li,
            keys = Seq(col("l_suppkey")),
            order = Seq(col("l_extendedprice").desc, col("l_orderkey"),
              col("l_linenumber"), col("l_partkey")),
            k = 5)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_extendedprice"))
      },
      oracle = Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
               l_extendedprice
        FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
                 l_extendedprice,
                 row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                            l_partkey) AS rn
          FROM lineitem)
        WHERE rn <= 5"""),
      headline = true),

    "q91_incremental_agg" -> QueryDef(
      build = (s, dir) => {
        val orders = Engine.table(s, dir, "orders")
          .selectExpr("o_custkey", "o_orderkey",
            "CAST(round(o_totalprice * 100) AS LONG) AS cents")
        val keys = Seq("o_custkey")
        val batches = (0 to 2).map(i => Relational.aggState(
          orders.filter(col("o_orderkey") % 3 === i), keys, "cents"))
        val state = Relational.mergeAggState(
          Relational.mergeAggState(batches(2), batches(0), keys),
          batches(1), keys)
        Relational.finishAggState(state, keys)
          .select(col("o_custkey"), col("n"),
            round(col("total") / 100.0, 2).as("total_spend"),
            round(col("lo") / 100.0, 2).as("min_spend"),
            round(col("hi") / 100.0, 2).as("max_spend"),
            round(col("mean") / 100.0, 6).as("mean_spend"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders)
        SELECT o_custkey, count(*) AS n,
               round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS total_spend,
               round(min(cents) / 100.0, 2) AS min_spend,
               round(max(cents) / 100.0, 2) AS max_spend,
               round((CAST(sum(cents) AS BIGINT) / CAST(count(*) AS BIGINT))
                     / 100.0, 6) AS mean_spend
        FROM c GROUP BY o_custkey"""),
      headline = true),

    // Approximate quantiles (GK sketch): the mergeable-summary path for
    // percentiles when an exact within-group sort (q46) is too costly —
    // sketches merge across partitions, so cost is one partial-agg pass.
    // Sketch values differ across engines, so (q47 pattern) the output
    // carries flags pinning each estimate inside the exact ±1% quantile
    // envelope — 10× the sketch's guaranteed 1/1000 rank error, so the
    // flags hold under ANY merge order — and the oracle asserts them
    // TRUE. The exact percentile pass rides along only for the oracle.
    "q81_approx_quantiles" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        def between(v: org.apache.spark.sql.Column, lo: Int, hi: Int) =
          v >= element_at(col("ex"), lo) && v <= element_at(col("ex"), hi)
        li.groupBy(col("l_returnflag"))
          .agg(expr("percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), 1000)")
            .as("ps"),
            expr("percentile(l_extendedprice, " +
              "array(0.24D, 0.26D, 0.49D, 0.51D, 0.74D, 0.76D))").as("ex"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"), col("n_rows"),
            between(element_at(col("ps"), 1), 1, 2).as("p25_ok"),
            between(element_at(col("ps"), 2), 3, 4).as("p50_ok"),
            between(element_at(col("ps"), 3), 5, 6).as("p75_ok"))
      },
      oracle = Some("""
        SELECT l_returnflag, count(*) AS n_rows,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        FROM lineitem GROUP BY l_returnflag"""))
  )
}
