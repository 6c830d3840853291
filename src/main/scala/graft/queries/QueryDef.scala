package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark build plus (when SQL-expressible) the
  * byte-equivalent DuckDB oracle SQL the driver hash-compares against.
  * `headline` marks the queries Bench times at sf0.1.
  */
case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared DuckDB spellings of the engine's seeded md5 hashes — ONE
  * definition (four query files embed these in their oracles), so a
  * width or spelling change cannot silently miss one file's oracles.
  * Must stay in lockstep with `graft.functions.hash60`/`hash56`.
  */
object OracleSql {
  /** Top 60 bits of md5 as BIGINT (twin of graft.functions.hash60). */
  def sqlHash60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Bits 60..116 of md5 as BIGINT (twin of graft.functions.hash56). */
  def sqlHash56(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 16, 14) AS BIGINT)"
}

/** Order-independent aggregation of money-like doubles.
  *
  * A grouped `sum(double)` is association-order-dependent: partials merge
  * in shuffle-fetch order (Spark) / thread order (DuckDB), so the low bits
  * — and occasionally a `round()` boundary — vary run to run (observed:
  * q26 hash-flip in round 1). The data's money columns are exact 2-decimal
  * values, so summing exact integer micros instead is associative,
  * deterministic at any thread count, and bit-identical across engines.
  *
  * Per-row `round(x*1e6)` is itself engine-agreed: the true value is a
  * ≤4-decimal decimal, so x*1e6 sits within ~1e-4 of an integer — never
  * near a rounding tie. Final division long→double is one IEEE op on
  * identical inputs. Callers must round at the value's NATURAL precision
  * (2dp for money, 4dp for price×(1−discount) products) so the last
  * round() is an identity, not a tie-decider. Long range: group sums stay
  * exact below 2^53 micros ≈ 9e9 in value — far above any sf≤1 group; at
  * warehouse scale switch the same shape to DecimalType accumulators.
  */
object ExactAgg {
  import graft.functions.{c_round => round}
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact integer micros of a money-like double column. */
  def micros(c: Column): Column = round(c * lit(1000000.0)).cast("long")

  /** Order-independent sum, rounded at the natural precision `dp`. */
  def sumExact(c: Column, dp: Int): Column =
    round(sum(micros(c)) / lit(1000000.0), dp)

  /** Order-independent mean (null-skipping, like SQL avg). */
  def avgExact(c: Column, dp: Int): Column =
    round(sum(micros(c)) / lit(1000000.0) / count(c), dp)

  /** DuckDB twin of [[sumExact]]. */
  def sqlSum(e: String, dp: Int): String =
    s"round(sum(CAST(round(($e) * 1000000) AS BIGINT)) / 1000000.0, $dp)"

  /** DuckDB twin of [[avgExact]]. */
  def sqlAvg(e: String, dp: Int): String =
    s"round(sum(CAST(round(($e) * 1000000) AS BIGINT)) / 1000000.0 / count($e), $dp)"
}
