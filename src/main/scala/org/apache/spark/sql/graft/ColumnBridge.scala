package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 moved these conversions
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * extensions that define native expressions re-export them from inside
  * the package — the standard pattern for Catalyst extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT hash60(col) …")` works alongside the Column API.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for cluster submit:
  *    `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *  - [[GraftFunctions.register]] for an already-built session (tests,
  *    notebooks).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach(e.injectFunction)
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[graft.expressions.Hash60].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("hash60"),
      info("hash60", "hash60(str) - first 60 bits of md5(str) as BIGINT"),
      (exprs: Seq[Expression]) => graft.expressions.Hash60(exprs.head)),
    (FunctionIdentifier("hash56"),
      info("hash56", "hash56(str) - md5(str) hex chars 16..29 as BIGINT"),
      (exprs: Seq[Expression]) => graft.expressions.Hash56(exprs.head)))

  /** Register on a live session (the extensions path needs session
    * construction time; this one does not).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
}
