package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark build plus (when SQL-expressible) the
  * byte-equivalent DuckDB oracle SQL the driver hash-compares against.
  * `headline` marks the queries Bench times at sf0.1.
  */
case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
