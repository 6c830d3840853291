package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact second-moment accumulation for embedding covariance — the
  * whitening/PCA-prep statistic — as a typed `Aggregator` on the
  * partial-aggregation path (the §2.10 extension point, sibling of
  * [[MinHashUnion]]).
  *
  * State is one Seq[Long] laid out [n, s_1..s_d, p_1..p_{d(d+1)/2}]:
  * the row count, per-dimension 1e-9-quantized component sums, and
  * 1e-9-quantized upper-triangle product sums (x_i·x_j quantized AFTER
  * the multiply, so the only rounding is the final 1e-9 grid). Integer
  * sums are associative — the result is bit-identical at any
  * partitioning AND reproducible in any engine that can sum integers,
  * which is what lets the q143 oracle rebuild the identical matrix in
  * DuckDB. Covariance itself is left to the caller
  * (P_ij/1e9/n − mean_i·mean_j) so the aggregate stays a pure mergeable
  * moment sketch.
  *
  * Quantization matches DuckDB `round()` exactly: half away from zero
  * on the binary double (NOT `Math.round`, which is half-toward-+∞ and
  * disagrees on negative ties; NOT shortest-decimal HALF_UP, which is
  * Spark's own `round` — both sides here are under our control, so we
  * pin the C-round semantics the oracle executes).
  *
  * At 100 TB: fixed d(d+3)/2+1 longs of state per group regardless of
  * group size — the mergeable-sketch scaling class. Long sums hold to
  * ~2^63/1e9 ≈ 9e9 rows per group at |x|≈1; beyond that, the ExactAgg
  * caveat applies (switch the same layout to Decimal accumulators).
  */
case class CovMoments(dims: Int)
    extends Aggregator[Seq[Double], Seq[Long], Seq[Long]] {
  require(dims >= 1, s"dims must be >= 1, got $dims")

  private val nProds = dims * (dims + 1) / 2

  /** DuckDB-round (half away from zero) of x·1e9. */
  @inline private def q(x: Double): Long = {
    val y = x * 1e9
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  def zero: Seq[Long] = Seq.empty

  def reduce(b: Seq[Long], a: Seq[Double]): Seq[Long] = {
    require(a.length == dims, s"vector width ${a.length}, expected $dims")
    val out = if (b.isEmpty) Array.fill(1 + dims + nProds)(0L)
      else b.toArray
    out(0) += 1L
    var i = 0
    var p = 1 + dims
    while (i < dims) {
      out(1 + i) += q(a(i))
      var j = i
      while (j < dims) {
        out(p) += q(a(i) * a(j))
        p += 1; j += 1
      }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"state widths differ: ${b1.length} vs ${b2.length}")
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(b1.length)(i => b1(i) + b2(i)))
    }

  def finish(r: Seq[Long]): Seq[Long] = r

  def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** 0-based flat offset of upper-triangle entry (i, j), i ≤ j. */
  def offset(i: Int, j: Int): Int = i * dims - i * (i - 1) / 2 + (j - i)

  /** Column-API handle: `df.agg(CovMoments(64)(col("vec")))`. */
  def apply(vec: Column): Column = udaf(this).apply(vec)
}
