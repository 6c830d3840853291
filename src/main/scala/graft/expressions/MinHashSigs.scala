package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash signature minimums of a document in ONE pass — the
  * fused form of `array_min(transform(shingles(text), …))` × k.
  *
  * Value contract (bit-identical to the composed form, so the DuckDB
  * oracle is unchanged):
  *   - word 3-shingles of `split(text, " ")`: for i in 0..max(n-3, 0),
  *     join the words at i, i+1, i+2 that exist with single spaces
  *     (matches concat_ws over null-padded element_at);
  *   - per shingle h1/h2 = [[Md5Hashes.hash60]]/[[Md5Hashes.hash56]];
  *   - sig_s = min over shingles of h1 + s·h2 (Kirsch–Mitzenmacher).
  *   Duplicate shingles are no-ops under min, so no distinct pass.
  *
  * Fusing removes the per-row shingle-string ARRAY materialization, the
  * k separate array traversals, and their codegen'd lambda dispatch —
  * one tight loop per document, still a pure projection (no exchange).
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 16, s"k=$k outside 1..16 (h1 + 15·h2 < 2^61 bound)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashSigs.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  def compute(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val last = math.max(words.length - 3, 0) // inclusive upper shingle start
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < 3) {
        val idx = i + j
        if (idx < words.length) {
          if (!first) sb.append(' ')
          sb.append(words(idx))
          first = false
        }
        j += 1
      }
      val sh = UTF8String.fromString(sb.toString)
      val h1 = Md5Hashes.hash60(sh)
      val h2 = Md5Hashes.hash56(sh)
      var s = 0
      while (s < k) {
        val v = h1 + s * h2
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
