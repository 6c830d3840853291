package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The full SimHash of a document in ONE pass — the fused form of
  * explode(tokens) → 32 per-bit vote sums → pack.
  *
  * Value contract (bit-identical to the composed form, so the DuckDB
  * oracle is unchanged):
  *   - tokens = `split(text, " ")` (duplicates COUNT — SimHash is a
  *     multiset vote, unlike MinHash's set minima);
  *   - per token h = [[Md5Hashes.hash60]]; bit b votes +1 if
  *     `(h >> b) & 1 = 1`, else −1;
  *   - output bit b is set iff its vote total is strictly positive.
  *
  * Fusing doesn't just shrink compute: the composed form EXPLODES the
  * corpus into one row per token and shuffles 32 partial vote buffers
  * per document through a hash aggregate — the fused expression is a
  * zero-exchange projection, so at 100 TB the simhash pass costs a scan,
  * not a scan plus a token-cardinality aggregate.
  */
case class SimHashBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 60, s"nBits=$nBits outside 1..60 (hash60 width)")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"
  override protected def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[UTF8String], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHashBits.compute($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {

  def compute(text: UTF8String, nBits: Int): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](nBits)
    var i = 0
    while (i < words.length) {
      val h = Md5Hashes.hash60(UTF8String.fromString(words(i)))
      var b = 0
      while (b < nBits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
