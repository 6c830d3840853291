package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table function (SURVEY.md §2.10 item (c)): tokenize `child`
  * with `regex`, emitting one output row per match — (1-based match
  * position, group 1..numGroups) — in a SINGLE regex pass.
  *
  * This is the Generator form of the PDF row tokenizer
  * (reference `pdf_to_xlsx.py:39-48` `finditer` + per-group reads). The
  * composed built-in form (`posexplode(regexp_extract_all(...))` + one
  * `regexp_extract` per group) re-runs the pattern 1+N times per row;
  * this runs it once — and `Statements` keeps the composed form as the
  * executable spec, with equivalence pinned on the real PDF fixtures
  * (`PdfSpec`).
  *
  * The pattern must be a foldable literal (compiled once per task, like
  * Spark's own regexp expressions). Generation itself is row-at-a-time
  * (`CodegenFallback` — custom generators don't participate in
  * whole-stage codegen; Spark's `GenerateExec` drives eval), which is
  * fine off the hot path: statement PDFs are thousands of rows, not
  * billions.
  */
case class RegexTokenize(child: Expression, regex: Expression, numGroups: Int)
    extends Generator with CodegenFallback {

  @transient private lazy val pattern: Pattern =
    Pattern.compile(regex.eval(null).toString)

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) +:
      (1 to numGroups).map(i => StructField(s"g$i", StringType, nullable = true)))

  override def children: Seq[Expression] = Seq(child, regex)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val m = pattern.matcher(t.toString)
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var pos = 0
      while (m.find()) {
        pos += 1
        out += InternalRow.fromSeq(pos +: (1 to numGroups).map { i =>
          val g = m.group(i)
          if (g == null) null else UTF8String.fromString(g)
        })
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), regex = newChildren(1))
}
