package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** DuckDB-exact decimal rounding of a double — `std::round(x·10^s)/10^s`,
  * the C library's half-away-from-zero on the BINARY value of `x·10^s`.
  *
  * Why this exists: Spark's `round(x, s)` rounds the SHORTEST-DECIMAL
  * representation of `x` (BigDecimal.valueOf → HALF_UP), DuckDB rounds
  * the binary product. The two agree except when the value sits within
  * an ulp of a representational tie — measured ~1.5 per million random
  * integer ratios, which across tens of thousands of oracle-compared
  * rounded outputs is a per-round red-cell lottery (q143 round 4, q123
  * at sf0.1 round 5: spark .192051 vs duckdb .192052 from identical
  * sums). Every oracle-facing `round` in the engine routes here
  * (`graft.functions.c_round`, imported as `round` in query/operator
  * files), so both engines execute the IDENTICAL floating operation and
  * ties cannot flip. Oracle SQL keeps DuckDB's own `round` untouched.
  *
  * Exactness note: `floor(y + 0.5)` alone is NOT std::round — for
  * y = nextafter(0.5, 0) the addition rounds up and floor returns 1
  * where std::round returns 0. The correction below subtracts the
  * spurious step whenever `|r − y| > 0.5` (only possible via the
  * addition's representational bump), making the result exact
  * half-away-from-zero for all finite y; DuckDB's round(DOUBLE, s) was
  * verified against this on the boundary cases and 2M random ratios.
  */
case class CRound(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "c_round"
  override protected def nullSafeEval(x: Any): Any =
    CRound.compute(x.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.expressions.CRound.compute($x, $scale)")
  override protected def withNewChildInternal(newChild: Expression): CRound =
    copy(child = newChild)
}

object CRound {
  def compute(x: Double, scale: Int): Double = {
    val p = math.pow(10.0, scale)
    val y = x * p
    if (!java.lang.Double.isFinite(y)) return x
    // |y| ≥ 2^52: y is integral (ulp ≥ 1) — y + 0.5 would tie-to-even
    // onto y ± 1 for odd y, so round(y) is just y
    if (math.abs(y) >= 4503599627370496.0) return y / p
    var r = if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
    // the addition can bump across the boundary (y = nextafter(k+0.5, 0)
    // has y + 0.5 round up to k+1); r ∓ 0.5 is EXACT for integral
    // |r| < 2^52, so this comparison sees the true boundary — `r − y`
    // does not (it can itself tie to exactly 0.5)
    if (y >= 0) { if (r - 0.5 > y) r -= 1.0 }
    else { if (r + 0.5 < y) r += 1.0 }
    r / p
  }
}
