package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator form of `explode(Dedup.shingles(text, w))`: one row
  * per DISTINCT word w-gram, built in a single pass over the tokenized
  * text with a hash-set dedup — no intermediate gram array, no
  * `transform` lambda dispatch, no `array_distinct` pass, no `explode` of
  * a materialized array. The composed form stays as the executable spec
  * (`Curation.gramTableComposed`) with multiset equivalence pinned in
  * `CurationSpec` on the real documents table.
  *
  * Parity details mirrored from the composed chain: Spark's
  * `split(text, " ")` keeps trailing empty tokens (limit -1); for texts
  * shorter than `w` tokens a single truncated gram is emitted
  * (`concat_ws` skips the out-of-range nulls); null text yields ONE empty
  * gram (`size(null)` is null, `greatest` skips it, so the composed chain
  * still generates index 0 and `concat_ws` over all-null tokens is "").
  */
case class ShingleExplode(child: Expression, w: Int)
    extends Generator with CodegenFallback {

  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def elementSchema: StructType =
    StructType(Seq(StructField("gram", StringType, nullable = false)))

  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Seq(InternalRow(UTF8String.EMPTY_UTF8))
    else {
      val toks = t.toString.split(" ", -1)
      val n = toks.length
      val last = math.max(n - w, 0)
      val seen = new java.util.LinkedHashSet[String](math.max(last * 2, 16))
      var i = 0
      while (i <= last) {
        val end = math.min(i + w, n)
        val sb = new java.lang.StringBuilder
        var k = i
        while (k < end) {
          if (k > i) sb.append(' ')
          sb.append(toks(k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[InternalRow](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = InternalRow(UTF8String.fromString(it.next()))
        j += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
