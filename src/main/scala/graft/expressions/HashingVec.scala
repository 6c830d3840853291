package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The signed feature-hashing vector of a document in ONE pass — the
  * fused form of `aggregate(transform(tokens, hash60), zeros, ...)`.
  *
  * Value contract (bit-identical to the composed form, so the DuckDB
  * oracle is unchanged):
  *   - tokens = `split(text, " ")` (trailing empties kept);
  *   - per token h = [[Md5Hashes.hash60]];
  *   - dimension h mod `dims`, sign +1 iff bit 4 of h is set, else −1;
  *   - vector = per-dimension sum of signs.
  *
  * Fusing matters more than usual here: higher-order functions
  * (`aggregate`/`transform`) sit outside whole-stage codegen AND the
  * composed fold allocates an intermediate dims-long array per token.
  * This is one tight loop with a single accumulator per document.
  */
case class HashingVec(child: Expression, dims: Int) extends UnaryExpression {
  require(dims >= 1 && dims <= 1024, s"dims=$dims outside 1..1024")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashing_vec"
  override protected def nullSafeEval(input: Any): Any =
    HashingVec.compute(input.asInstanceOf[UTF8String], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashingVec.compute($c, $dims)")
  override protected def withNewChildInternal(newChild: Expression): HashingVec =
    copy(child = newChild)
}

object HashingVec {

  def compute(text: UTF8String, dims: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val acc = new Array[Long](dims)
    var i = 0
    while (i < words.length) {
      val h = Md5Hashes.hash60(UTF8String.fromString(words(i)))
      val d = (h % dims).toInt // h is non-negative (60-bit)
      acc(d) += (if (((h >> 4) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    new GenericArrayData(acc)
  }
}
