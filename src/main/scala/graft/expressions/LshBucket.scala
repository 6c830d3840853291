package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH bucket id in ONE pass: bit p of the result is
  * set iff dot(v, plane_p) > 0, planes being the deterministic ±1 sign
  * matrix of [[graft.operators.Similarity.planeSign]] (md5 parity of
  * "plane:dim") — the same literal matrix the composed form and the SQL
  * oracles embed, derived here from (nPlanes, dims) instead of shipped
  * as k literal arrays.
  *
  * Each plane's dot is the same sequential fold as the composed
  * `aggregate(zip_with(v, planeLit, *), 0.0, +)` (±1.0 multiplication is
  * exact), so bucket ids are bit-identical.
  */
case class LshBucket(child: Expression, nPlanes: Int, dims: Int)
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes=$nPlanes outside 1..62")
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  // one sign matrix per expression instance (driver-side construction,
  // serialized with the plan)
  private lazy val signs: Array[Array[Double]] =
    Array.tabulate(nPlanes, dims)((p, d) =>
      graft.operators.Similarity.planeSign(p, d).toDouble)

  override protected def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LshBucket.compute($c, $signsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def compute(v: ArrayData, signs: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < signs.length) {
      val plane = signs(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getDouble(i) * plane(i)
        i += 1
      }
      if (acc > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
