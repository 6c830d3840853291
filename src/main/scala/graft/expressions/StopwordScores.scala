package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** All language stopword-hit counts of a document in ONE pass — the
  * fused form of `size(filter(split(text," "), t ∈ words))` × 5 that
  * langId/qualityScore would otherwise evaluate as five separate
  * tokenize+filter chains per row.
  *
  * Value contract (identical to the composed form, so the DuckDB oracle
  * is unchanged): tokens are `split(text, " ")` with trailing empties
  * kept; output[i] counts tokens contained in [[StopwordScores.langs]]
  * table i for i<4, and output[4] counts tokens in the distinct union of
  * all tables. Exact, case-sensitive token equality.
  */
case class StopwordScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_scores"
  override protected def nullSafeEval(input: Any): Any =
    StopwordScores.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.StopwordScores.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): StopwordScores =
    copy(child = newChild)
}

object StopwordScores {

  /** Canonical stopword tables (single source of truth — the composed
    * operators in graft.operators.TextAnalysis read them from here).
    * Order is the language-ID tie-break (first wins).
    */
  val langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "les", "de", "et", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "zu", "ist"))

  /** Distinct union of every table (qualityScore's stopword set). */
  val allStop: Seq[String] = langs.flatMap(_._2).distinct

  // token → 5-bit membership mask (bit i = in table i, bit 4 = in union)
  private val mask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev: Integer = m.getOrDefault(w, Integer.valueOf(0))
        m.put(w, Integer.valueOf(prev.intValue() | (1 << i) | (1 << 4)))
      }
    }
    m
  }

  def compute(text: UTF8String): ArrayData = {
    val counts = new Array[Int](5)
    val toks = text.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val m = mask.get(toks(i))
      if (m != null) {
        val mv = m.intValue()
        var b = 0
        while (b < 5) {
          if ((mv & (1 << b)) != 0) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
