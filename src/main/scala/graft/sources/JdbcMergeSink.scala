package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JDBC warehouse edge (SURVEY.md §2.1 S5/S8, §2.9 M1-M5): set-oriented
  * replacements for the reference's per-row psycopg2 round-trips
  * (`database_utils.py:57-280` — ≥5 statements per ingested row).
  *
  *  - Dim scans (S5) read whole catalogs once and broadcast.
  *  - The upsert sink (S8) stages each partition's rows with batched
  *    INSERTs into a temp table, then merges with ONE
  *    `INSERT … SELECT … ON CONFLICT` statement per partition —
  *    the same final SQL semantics as the reference's M1 store upsert,
  *    with per-partition transactions (M5: commit-or-rollback a unit).
  *
  * SQL generation is pure and unit-tested; the IO path is exercised only
  * where a live database exists (none ships in this environment).
  * Connection counts at 100 TB: `coalesce` the DataFrame before calling
  * [[upsert]] — one connection per partition is the contract.
  */
object JdbcMergeSink {

  /** S5: catalog dim scan, broadcast for J3/J4-style lookups
    * (`database_utils.py:33-41` loads these dicts once per run).
    */
  def readDim(spark: SparkSession, url: String, table: String,
              props: Properties): DataFrame =
    broadcast(spark.read.jdbc(url, table, props))

  /** Staged-merge statement set for one partition of `table` rows.
    * Mirrors M1 (`INSERT … ON CONFLICT (key) DO UPDATE SET …`,
    * `database_utils.py:70-79`) generalized to any column/key split:
    * `updateCols` empty → DO NOTHING (M2 insert-if-absent semantics).
    */
  def mergeSql(table: String, columns: Seq[String], conflictKeys: Seq[String],
               updateCols: Seq[String]): MergeSql = {
    require(conflictKeys.nonEmpty, "conflictKeys must be non-empty")
    val cols = columns.mkString(", ")
    val staging = s"_staging_$table"
    val conflict =
      if (updateCols.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updateCols
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    MergeSql(
      createStaging =
        s"CREATE TEMP TABLE IF NOT EXISTS $staging (LIKE $table INCLUDING DEFAULTS) ON COMMIT DROP",
      insertStaging =
        s"INSERT INTO $staging ($cols) VALUES (${columns.map(_ => "?").mkString(", ")})",
      merge =
        s"""INSERT INTO $table ($cols)
           |SELECT $cols FROM $staging
           |ON CONFLICT (${conflictKeys.mkString(", ")}) $conflict""".stripMargin)
  }

  final case class MergeSql(createStaging: String, insertStaging: String,
                            merge: String)

  /** S8: write `df` into `table` with staged `ON CONFLICT` merge — one
    * connection, one transaction, one merge statement per partition.
    * Batched inserts (`batchSize`) into the temp staging table replace
    * the reference's row-at-a-time execute loop.
    */
  def upsert(df: DataFrame, url: String, table: String,
             conflictKeys: Seq[String], updateCols: Seq[String],
             props: Properties, batchSize: Int = 1000): Unit = {
    val columns = df.columns.toSeq
    val sql = mergeSql(table, columns, conflictKeys, updateCols)
    val propPairs = props.stringPropertyNames().toArray(Array.empty[String])
      .map(k => k -> props.getProperty(k)).toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propPairs.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false) // M5: one transaction per partition
          execute(conn, sql.createStaging)
          val ps = conn.prepareStatement(sql.insertStaging)
          try {
            var n = 0
            rows.foreach { r =>
              bind(ps, r)
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) ps.executeBatch()
            }
            ps.executeBatch()
          } finally ps.close()
          execute(conn, sql.merge)
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  private def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def bind(ps: PreparedStatement, r: Row): Unit = {
    var i = 0
    while (i < r.length) {
      ps.setObject(i + 1, r.get(i))
      i += 1
    }
  }
}
