package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator for exact-substring-dedup windows: one row
  * (pos, gh) per POSITIONAL w-token window, gh = hash60 of the
  * space-joined window — in a single pass over the tokenized text, with
  * no per-window gram-string array, no `slice`/`concat_ws` element
  * allocations, and no posexplode of a materialized array. The composed
  * chain (`Dedup.substringWindowsComposed`) stays as the executable
  * spec, equivalence pinned in OperatorsSpec.
  *
  * Parity contract (mirrors the composed spelling in
  * `Dedup.substringDupStats`): `split(text, " ", -1)` token semantics
  * (trailing empties kept); texts with fewer than w tokens emit NO rows
  * (positional windows, unlike ShingleExplode's truncated-gram
  * convention); null text emits no rows (the composed chain's
  * `size(null)` filter drops it).
  */
case class WindowHashExplode(child: Expression, w: Int)
    extends Generator with CodegenFallback {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def elementSchema: StructType =
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("gh", LongType, nullable = false)))

  override def children: Seq[Expression] = Seq(child)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Seq.empty
    else {
      val toks = t.toString.split(" ", -1)
      val n = toks.length
      if (n < w) Seq.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private val sb = new java.lang.StringBuilder
        override def hasNext: Boolean = i <= n - w
        override def next(): InternalRow = {
          sb.setLength(0)
          var k = i
          while (k < i + w) {
            if (k > i) sb.append(' ')
            sb.append(toks(k))
            k += 1
          }
          val row = InternalRow(i,
            Md5Hashes.hash60(UTF8String.fromString(sb.toString)))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowHashExplode =
    copy(child = newChildren.head)
}
