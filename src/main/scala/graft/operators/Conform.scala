package graft.operators

import graft.{functions => gf}
import org.apache.spark.sql.DataFrame
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType}

/** Schema-contract conformance (SURVEY.md §1.3) — the set-oriented analog
  * of the reference's `verify_columns` + `deep_clean_data`
  * (`import_files_to_postgre.py:67-73`, `:120-132`): validate required
  * columns, inject missing optional ones as nulls (P3), and apply the
  * forgiving null-on-failure typing row-set-wide.
  */
object Conform {

  /** What a conformed frame must look like.
    *
    * @param required columns that must exist (error otherwise — the
    *                 engine's strict mode; the reference logs + degrades)
    * @param optional columns injected as null strings when absent
    *                 (`import_files_to_postgre.py:83-89` Marca/Categoria)
    * @param numeric  columns run through safe_float (C2)
    * @param dates    columns cast to DateType
    *                 (everything else gets C4 null normalization)
    */
  case class Contract(required: Seq[String] = Nil, optional: Seq[String] = Nil,
                      numeric: Seq[String] = Nil, dates: Seq[String] = Nil)

  /** Columns never touched by cleaning: source metadata. */
  private def isMeta(c: String): Boolean = c.startsWith("_")

  def conform(df: DataFrame, contract: Contract): DataFrame = {
    val missing = contract.required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    val withOptional = contract.optional.filterNot(df.columns.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast(StringType)))
    def q(n: String) = col(s"`$n`")
    withOptional.select(withOptional.columns.map {
      case c if contract.numeric.contains(c) => gf.safe_float(q(c)).as(c)
      case c if contract.dates.contains(c) => q(c).cast(DateType).as(c)
      case c if isMeta(c) => q(c)
      case c => gf.normalize_null(q(c)).as(c)
    }.toSeq: _*)
  }

  /** Declarative data-quality audit: evaluate every named predicate in
    * ONE scan (each rule folds to a conditional count in a single scalar
    * aggregate — no per-rule pass, no shuffle beyond the partial-agg
    * merge), then unpivot to the (rule, n_violations, violation_rate)
    * report a pipeline gates on. Null predicate results count as
    * violations (a rule that cannot evaluate is failing).
    */
  def audit(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    val counts = df.agg(count(lit(1)).as("__n"),
      rules.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(name)
      }: _*)
    counts
      .unpivot(Array(col("__n")), rules.map(r => col(r._1)).toArray,
        "rule", "n_violations")
      .select(col("rule"), col("n_violations"),
        round(col("n_violations").cast("double") / col("__n"), 6)
          .as("violation_rate"))
  }
}
