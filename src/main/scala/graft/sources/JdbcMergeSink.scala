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
  *    INSERTs into a staging table, then merges with ONE set-oriented
  *    statement per partition — the same final SQL semantics as the
  *    reference's M1 store upsert, with per-partition transactions
  *    (M5: commit-or-rollback a unit).
  *
  * The merge statement is dialect-specific ([[MergeDialect]]):
  * [[PostgresDialect]] emits the reference's exact
  * `INSERT … ON CONFLICT` shape (`database_utils.py:70-79`);
  * [[DerbyDialect]] emits standard `MERGE INTO`, which lets the whole
  * staged-merge path — staging DDL, batched binds, merge, transaction,
  * replay idempotency — execute for real against the embedded Derby
  * that ships with Spark (`JdbcMergeSpec`). Both dialects share every
  * line of the IO path; only statement text differs.
  *
  * Connection counts at 100 TB: `coalesce` the DataFrame before calling
  * [[upsert]] — one connection per partition is the contract. Duplicate
  * conflict keys within one batch are the caller's to resolve first
  * (both `ON CONFLICT` and `MERGE` reject a row affected twice — same
  * contract as the reference's per-file dedup gate).
  */
object JdbcMergeSink {

  /** S5: catalog dim scan, broadcast for J3/J4-style lookups
    * (`database_utils.py:33-41` loads these dicts once per run).
    */
  def readDim(spark: SparkSession, url: String, table: String,
              props: Properties): DataFrame =
    broadcast(spark.read.jdbc(url, table, props))

  final case class MergeSql(createStaging: String, insertStaging: String,
                            merge: String, dropStaging: Option[String] = None)

  /** Statement generation for one target database flavor. Implementations
    * must be objects (serialized into the `foreachPartition` closure).
    */
  sealed trait MergeDialect extends Serializable {
    /** Staging-table name for one partition's batch. Must be unique per
      * concurrent partition unless the dialect's staging DDL is
      * per-session scoped (Postgres TEMP tables are; plain tables are
      * not).
      */
    def stagingName(table: String): String
    def statements(table: String, staging: String, columns: Seq[String],
                   conflictKeys: Seq[String], updateCols: Seq[String]): MergeSql
  }

  /** The reference's target: staged `INSERT … SELECT … ON CONFLICT`
    * (`database_utils.py:70-79`; M2 DO NOTHING at `:99-113`). TEMP tables
    * are session-scoped and `ON COMMIT DROP`, so the fixed staging name
    * is safe across concurrent partitions and nothing needs dropping.
    */
  case object PostgresDialect extends MergeDialect {
    def stagingName(table: String): String = s"_staging_$table"
    def statements(table: String, staging: String, columns: Seq[String],
                   conflictKeys: Seq[String], updateCols: Seq[String]): MergeSql = {
      val cols = columns.mkString(", ")
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
  }

  /** Standard-SQL `MERGE INTO` flavor, runnable on the embedded Derby in
    * Spark's own classpath — the live end-to-end test bed for the staged
    * merge mechanism. Derby has no session-scoped `CREATE TABLE LIKE`,
    * so staging is a uniquely-named real table created `WITH NO DATA`
    * and dropped in the same transaction.
    */
  case object DerbyDialect extends MergeDialect {
    def stagingName(table: String): String =
      s"staging_${table}_${java.util.UUID.randomUUID.toString.replace("-", "").take(12)}"
    def statements(table: String, staging: String, columns: Seq[String],
                   conflictKeys: Seq[String], updateCols: Seq[String]): MergeSql = {
      val cols = columns.mkString(", ")
      val on = conflictKeys.map(k => s"t.$k = s.$k").mkString(" AND ")
      val matched =
        if (updateCols.isEmpty) ""
        else "\nWHEN MATCHED THEN UPDATE SET " + updateCols
          .map(c => s"$c = s.$c").mkString(", ")
      MergeSql(
        createStaging =
          s"CREATE TABLE $staging AS SELECT * FROM $table WITH NO DATA",
        insertStaging =
          s"INSERT INTO $staging ($cols) VALUES (${columns.map(_ => "?").mkString(", ")})",
        merge =
          s"""MERGE INTO $table t USING $staging s ON ($on)$matched
             |WHEN NOT MATCHED THEN INSERT ($cols)
             |VALUES (${columns.map(c => s"s.$c").mkString(", ")})""".stripMargin,
        dropStaging = Some(s"DROP TABLE $staging"))
    }
  }

  /** Staged-merge statement set for one partition of `table` rows in the
    * reference's Postgres flavor (kept as the pinned-SQL surface;
    * `upsert` threads any [[MergeDialect]] through the same path).
    */
  def mergeSql(table: String, columns: Seq[String], conflictKeys: Seq[String],
               updateCols: Seq[String]): MergeSql = {
    require(conflictKeys.nonEmpty, "conflictKeys must be non-empty")
    PostgresDialect.statements(table, PostgresDialect.stagingName(table),
      columns, conflictKeys, updateCols)
  }

  /** S8: write `df` into `table` with a staged merge — one connection,
    * one transaction, one merge statement per partition. Batched inserts
    * (`batchSize`) into the staging table replace the reference's
    * row-at-a-time execute loop.
    */
  def upsert(df: DataFrame, url: String, table: String,
             conflictKeys: Seq[String], updateCols: Seq[String],
             props: Properties, batchSize: Int = 1000,
             dialect: MergeDialect = PostgresDialect): Unit = {
    require(conflictKeys.nonEmpty, "conflictKeys must be non-empty")
    val columns = df.columns.toSeq
    val propPairs = props.stringPropertyNames().toArray(Array.empty[String])
      .map(k => k -> props.getProperty(k)).toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val staging = dialect.stagingName(table)
        val sql = dialect.statements(table, staging, columns, conflictKeys,
          updateCols)
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
          sql.dropStaging.foreach(execute(conn, _))
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
