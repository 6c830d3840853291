package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Native generator form of the q89 pair expansion: given a sorted
  * distinct array of item ids, emit every unordered pair (i < j) as ONE
  * packed long `(a << 32) | b` — the 8-byte key the count shuffle rides
  * on. Replaces the composed nested
  * `explode(flatten(transform(sequence…, transform(sequence…))))` chain,
  * which materializes two lambda levels and an O(n²) intermediate array
  * per row before exploding it. Composed twin kept as the executable
  * spec in `AnalyticsQueries`; equivalence pinned in `CurationSpec`.
  *
  * Null/empty/singleton arrays emit no rows (`sequence(2, size)` in the
  * composed form is empty for size < 2, and explode of null is no rows).
  */
case class PairPackExplode(child: Expression)
    extends Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("pack", LongType, nullable = false)))

  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Nil
    else {
      val n = arr.numElements()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = arr.getLong(i); i += 1 }
      val out = new Array[InternalRow](n * (n - 1) / 2)
      var k = 0
      i = 0
      while (i < n) {
        val hi = ids(i) << 32
        var j = i + 1
        while (j < n) {
          out(k) = InternalRow(hi + ids(j))
          k += 1
          j += 1
        }
        i += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
