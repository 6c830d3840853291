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

  /** Eagerly-converted expression (resolvable by the analyzer when
    * embedded in a hand-built logical node, unlike the lazy node form).
    */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a hand-built logical plan as a DataFrame (Spark 4 moved
    * `Dataset.ofRows` behind `private[sql]`).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
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
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[graft.expressions.Hash60].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  /** Lift a 1-arg Column combinator from the scalar library into a SQL
    * function builder: the registered function expands to the SAME
    * composed built-in expression tree as the Column API (stays inside
    * whole-stage codegen — this is NOT a UDF registration). The Column's
    * lazy node tree is converted EAGERLY to catalyst expressions
    * (ColumnNodeToExpressionConverter) so the analyzer resolves the
    * inner function calls like any parsed SQL.
    */
  private def toExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Arity gate for every registered builder: `simhash(text, 64)` must be
    * an analysis error naming the function, not a silent drop of the
    * extra argument (and zero args must not surface as a raw
    * NoSuchElementException from `exprs.head`).
    */
  private def requireArity(name: String, expected: Int,
                           exprs: Seq[Expression]): Unit =
    if (exprs.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> s"`$name`", "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))

  private def lift1(name: String)(f: Column => Column): Seq[Expression] => Expression = {
    exprs =>
      requireArity(name, 1, exprs)
      toExpr(f(ExpressionUtils.column(exprs.head)))
  }

  private def lift2(name: String)(f: (Column, Column) => Column): Seq[Expression] => Expression = {
    exprs =>
      requireArity(name, 2, exprs)
      toExpr(f(ExpressionUtils.column(exprs(0)), ExpressionUtils.column(exprs(1))))
  }

  /** 1-arg native-expression builder with the same arity gate. */
  private def native1(name: String)(f: Expression => Expression): Seq[Expression] => Expression = {
    exprs =>
      requireArity(name, 1, exprs)
      f(exprs.head)
  }

  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("hash60"),
      info("hash60", "hash60(str) - first 60 bits of md5(str) as BIGINT"),
      native1("hash60")(graft.expressions.Hash60(_))),
    (FunctionIdentifier("hash56"),
      info("hash56", "hash56(str) - md5(str) hex chars 16..29 as BIGINT"),
      native1("hash56")(graft.expressions.Hash56(_))),
    // The reference's scalar surface (SURVEY.md §2.7), SQL-callable. Each
    // expands to the identical composed expression tree as the Column API
    // (graft.functions), so `spark.sql("SELECT safe_float(c) …")` and
    // `df.select(safe_float(col("c")))` produce the same plan.
    (FunctionIdentifier("safe_float"),
      info("safe_float", "safe_float(str) - forgiving float parse, EU comma, null-on-fail"),
      lift1("safe_float")(graft.functions.safe_float)),
    (FunctionIdentifier("normalize_null"),
      info("normalize_null", "normalize_null(str) - None/none/NaN/'' sentinels to NULL"),
      lift1("normalize_null")(graft.functions.normalize_null)),
    (FunctionIdentifier("clean_money"),
      info("clean_money", "clean_money(str) - strip $,+ and spaces, re-apply sign, parse"),
      lift1("clean_money")(graft.functions.clean_money)),
    (FunctionIdentifier("spanish_to_date"),
      info("spanish_to_date", "spanish_to_date(str) - dd-MMM-yyyy with Spanish month abbrevs"),
      lift1("spanish_to_date")(graft.functions.spanish_to_date)),
    (FunctionIdentifier("statement_date"),
      info("statement_date", "statement_date(str) - C-locale dd-MMM-yyyy parse (reference parity)"),
      lift1("statement_date")(graft.functions.statement_date)),
    (FunctionIdentifier("filename_date"),
      info("filename_date", "filename_date(date) - ddMMMyyyy filename token"),
      lift1("filename_date")(graft.functions.filename_date)),
    (FunctionIdentifier("excel_serial_date"),
      info("excel_serial_date", "excel_serial_date(n) - Excel serial number to date"),
      lift1("excel_serial_date")(graft.functions.excel_serial_date)),
    (FunctionIdentifier("store_name"),
      info("store_name", "store_name(url) - host-derived store token (C7)"),
      lift1("store_name")(graft.functions.store_name)),
    (FunctionIdentifier("provider_url"),
      info("provider_url", "provider_url(url) - canonicalized provider URL (C8)"),
      lift1("provider_url")(graft.functions.provider_url)),
    (FunctionIdentifier("domain_store"),
      info("domain_store", "domain_store(url) - lowercased domain with ML special case (C9)"),
      lift1("domain_store")(graft.functions.domain_store)),
    (FunctionIdentifier("canonical_url"),
      info("canonical_url", "canonical_url(url) - RFC 3986 §6 normalization + tracking-param drop, sorted query"),
      lift1("canonical_url")(graft.functions.canonical_url)),
    (FunctionIdentifier("pct_upper"),
      info("pct_upper", "pct_upper(str) - uppercase the hex digits of every percent-escape"),
      lift1("pct_upper")(graft.functions.pct_upper)),
    (FunctionIdentifier("truncate500"),
      info("truncate500", "truncate500(str) - sink-side 500-char truncation (C11)"),
      lift1("truncate500")(graft.functions.truncate500)),
    (FunctionIdentifier("derived_price"),
      info("derived_price", "derived_price(venta, final_cost) - 30% margin fallback (C12)"),
      lift2("derived_price")(graft.functions.derived_price)),
    (FunctionIdentifier("derived_offer"),
      info("derived_offer", "derived_offer(oferta, price) - 15% offer fallback (C12)"),
      lift2("derived_offer")(graft.functions.derived_offer)),
    (FunctionIdentifier("default_if_falsy"),
      info("default_if_falsy", "default_if_falsy(c, default) - pandas-truthiness default (C14)"),
      lift2("default_if_falsy")(graft.functions.default_if_falsy)),
    (FunctionIdentifier("c_round"),
      info("c_round", "c_round(x[, s]) - DuckDB-exact half-away-from-zero rounding of a double"),
      { exprs =>
        if (exprs.isEmpty || exprs.length > 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`c_round`", "expectedNum" -> "1 or 2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val scale = if (exprs.length == 2) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`c_round` (scale must be an int literal)",
              "expectedNum" -> "2", "actualNum" -> other.sql,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        } else 0
        graft.expressions.CRound(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
            org.apache.spark.sql.types.DoubleType), scale)
      }),
    (FunctionIdentifier("redact_pii"),
      info("redact_pii", "redact_pii(str) - mask emails, IPv4s, card-like digit runs"),
      lift1("redact_pii")(graft.operators.Curation.redactPii)),
    (FunctionIdentifier("quality_logit"),
      info("quality_logit", "quality_logit(str) - linear quality-model logit over text features"),
      lift1("quality_logit")(c => graft.operators.Curation.qualityLogit(c))),
    // Fused text-sketch expressions (the training-data surface),
    // SQL-callable with literal int parameters where present.
    (FunctionIdentifier("simhash"),
      info("simhash", "simhash(str) - 32-bit SimHash over whitespace tokens, one pass"),
      native1("simhash")(graft.expressions.SimHashBits(_, 32))),
    (FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(str) - 16 MinHash signature minima of word 3-shingles"),
      native1("minhash_sigs")(graft.expressions.MinHashSigs(_, 16))),
    (FunctionIdentifier("hashing_vec"),
      info("hashing_vec", "hashing_vec(str) - 16-dim signed feature-hashing vector"),
      native1("hashing_vec")(graft.expressions.HashingVec(_, 16))))

  /** Register on a live session (the extensions path needs session
    * construction time; this one does not).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
}
