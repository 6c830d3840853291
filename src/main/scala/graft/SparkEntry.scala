package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; those with ANSI-SQL-expressible semantics also carry a
  * DuckDB oracle the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def all: Seq[(String, QueryDef)] =
    RelationalQueries.defs ++ ScalarQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      IngestionQueries.defs ++ MultimodalQueries.defs ++
      AnalyticsQueries.defs ++ CurationQueries.defs ++
      GraphQueries.defs ++ WriterQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The FULL pretraining pipeline (q161) — Gopher rule gate →
    * boilerplate removal with doc rebuild → exact dedup on cleaned
    * text → benchmark decontamination → per-language token budget in
    * one DAG — exercises scan, codegen'd scalar chains, native
    * generators, anti-joins, broadcast joins, hash aggregation, and
    * the two-pass stratum prefix sum together.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q161_pretrain_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql), _)) =>
      name -> sql.trim
    }.toMap

  /** The subset Bench times at sf0.1. */
  def headline: Seq[String] = all.collect {
    case (name, d) if d.headline => name
  }
}
