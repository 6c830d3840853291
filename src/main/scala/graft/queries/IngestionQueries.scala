package graft.queries

import graft.Engine
import graft.plans.Ingestion
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Driver-contract coverage for the ingestion pipeline's sink-side merge
  * operators (SURVEY.md §2.9) over the TPC-H-ish testdata — the xlsx
  * end-to-end path is covered by IngestionSpec's golden tests; this
  * exposes the reusable SCD merge to the DuckDB correctness gate.
  */
object IngestionQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // M4 SCD-style upsert (`database_utils.py:260-280`): current price dim
    // from part, updates from a lineitem aggregate; matched-and-changed
    // rows move start/end_date to the batch date, unmatched updates insert
    // open-ended. Same shape as MERGE INTO on Delta-capable sinks.
    "q39_scd_price_merge" -> QueryDef(
      build = (s, dir) => {
        val part = Engine.table(s, dir, "part")
        val li = Engine.table(s, dir, "lineitem")
        val current = part.filter(col("p_partkey") % 3 =!= 0)
          .select(col("p_partkey").as("id_product"),
            round(col("p_retailprice"), 2).as("price"),
            round(col("p_retailprice") * 0.8, 2).as("offer_price"),
            to_date(lit("2026-01-01")).as("start_date"),
            lit(null).cast("date").as("end_date"))
        val updates = li.filter(col("l_discount") > 0.08)
          .groupBy(col("l_partkey").as("id_product"))
          .agg(round(max(col("l_extendedprice")), 2).as("price"),
            round(max(col("l_extendedprice")) * 0.8, 2).as("offer_price"))
        Ingestion.scdMerge(current, updates, to_date(lit("2026-08-12")))
          .select(col("id_product"), col("price"), col("offer_price"),
            col("start_date").cast("string").as("start_date"),
            col("end_date").cast("string").as("end_date"))
      },
      oracle = Some("""
        WITH current AS (
          SELECT p_partkey AS id_product,
                 round(p_retailprice, 2) AS price,
                 round(p_retailprice * 0.8, 2) AS offer_price,
                 DATE '2026-01-01' AS start_date,
                 CAST(NULL AS DATE) AS end_date
          FROM part WHERE p_partkey % 3 <> 0),
        updates AS (
          SELECT l_partkey AS id_product,
                 round(max(l_extendedprice), 2) AS price,
                 round(max(l_extendedprice) * 0.8, 2) AS offer_price
          FROM lineitem WHERE l_discount > 0.08 GROUP BY 1)
        SELECT c.id_product,
               coalesce(u.price, c.price) AS price,
               coalesce(u.offer_price, c.offer_price) AS offer_price,
               CAST(CASE WHEN u.id_product IS NOT NULL
                          AND c.price IS DISTINCT FROM u.price
                     THEN DATE '2026-08-12' ELSE c.start_date END AS VARCHAR) AS start_date,
               CAST(CASE WHEN u.id_product IS NOT NULL
                          AND c.price IS DISTINCT FROM u.price
                     THEN DATE '2026-08-12' ELSE c.end_date END AS VARCHAR) AS end_date
        FROM current c LEFT JOIN updates u USING (id_product)
        UNION ALL
        SELECT u.id_product, u.price, u.offer_price,
               CAST(DATE '2026-08-12' AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM updates u ANTI JOIN current c USING (id_product)"""),
      headline = true)
  )
}
