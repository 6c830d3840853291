package graft

import graft.sources.JdbcMergeSink
import org.scalatest.funsuite.AnyFunSuite

/** Staged-merge SQL generation (S8/M1-M5) plus the LIVE round-trip: the
  * Postgres statement set is the pinned reference contract
  * (`database_utils.py:70-79`), and the same staged-merge IO path —
  * staging DDL, batched binds, one merge + one transaction per
  * partition, replay idempotency — executes for real against embedded
  * Derby (in Spark's own classpath) via the MERGE dialect in
  * [[JdbcLiveMergeSpec]].
  */
class JdbcMergeSpec extends AnyFunSuite {

  test("store upsert mirrors the reference's ON CONFLICT DO UPDATE (M1)") {
    val sql = JdbcMergeSink.mergeSql("store",
      columns = Seq("store_name", "store_url", "status"),
      conflictKeys = Seq("store_name"),
      updateCols = Seq("store_url"))
    assert(sql.merge ==
      """INSERT INTO store (store_name, store_url, status)
        |SELECT store_name, store_url, status FROM _staging_store
        |ON CONFLICT (store_name) DO UPDATE SET store_url = EXCLUDED.store_url""".stripMargin)
    assert(sql.insertStaging ==
      "INSERT INTO _staging_store (store_name, store_url, status) VALUES (?, ?, ?)")
    assert(sql.createStaging.contains("TEMP TABLE"))
    assert(sql.createStaging.contains("ON COMMIT DROP"))
  }

  test("insert-if-absent (M2, provider/product) degrades to DO NOTHING") {
    val sql = JdbcMergeSink.mergeSql("provider",
      columns = Seq("id_store", "provider_url", "is_active"),
      conflictKeys = Seq("id_store", "provider_url"),
      updateCols = Seq.empty)
    assert(sql.merge.endsWith("ON CONFLICT (id_store, provider_url) DO NOTHING"))
  }

  test("empty conflict keys are rejected") {
    intercept[IllegalArgumentException] {
      JdbcMergeSink.mergeSql("t", Seq("a"), Seq.empty, Seq.empty)
    }
  }
}

/** The staged merge executed END TO END against a real database, as
  * DIALECT-PARAMETERIZED behaviors: every test takes the dialect only
  * through [[JdbcMergeSink.upsert]]'s `dialect` argument, so all four
  * behaviors (M1 update-on-conflict, M2 insert-if-absent, M5 replay
  * idempotency, rollback-leaves-no-debris — what the reference does per
  * file, `import_files_to_postgre.py:228-237`) exercise the ONE shared
  * IO path: staging DDL, batched binds, one merge + one transaction per
  * partition. Only the statement text differs per dialect.
  *
  * Concrete suites plug in (dialect, url). [[JdbcLiveMergeSpec]] runs
  * the standard-SQL MERGE dialect on the embedded in-memory Derby that
  * ships in `/opt/spark/jars` — the EXECUTABLE PROXY for the Postgres
  * target: no pg-compatible embedded engine exists in this offline
  * classpath (no H2/pgjdbc jar), so `PostgresDialect`'s `ON CONFLICT`
  * text stays pinned by the string specs above, and running it live is
  * one subclass (`JdbcLiveMergeBehaviors(PostgresDialect, pgUrl)`) the
  * moment an engine that parses it is available.
  */
abstract class JdbcLiveMergeBehaviors(
    dialect: JdbcMergeSink.MergeDialect, url: String)
    extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import java.sql.DriverManager

  private val props = new java.util.Properties()

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sql: String): Unit =
    withConn { c => val st = c.createStatement(); try st.execute(sql) finally st.close() }

  private def queryStore(): Map[String, (String, Double)] = withConn { c =>
    val rs = c.createStatement()
      .executeQuery("SELECT store_name, store_url, price FROM store")
    val b = Map.newBuilder[String, (String, Double)]
    while (rs.next()) b += rs.getString(1) -> (rs.getString(2), rs.getDouble(3))
    b.result()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec("""CREATE TABLE store (
      store_name VARCHAR(64) NOT NULL PRIMARY KEY,
      store_url VARCHAR(256), price DOUBLE)""")
  }

  test("M1 upsert: inserts new keys, updates listed columns on conflict") {
    import spark.implicits._
    val batch1 = Seq(("alpha", "http://a", 1.0), ("beta", "http://b", 2.0),
        ("gamma", "http://c", 3.0))
      .toDF("store_name", "store_url", "price").repartition(2)
    JdbcMergeSink.upsert(batch1, url, "store", Seq("store_name"),
      updateCols = Seq("store_url", "price"), props, dialect = dialect)
    assert(queryStore() == Map("alpha" -> ("http://a", 1.0),
      "beta" -> ("http://b", 2.0), "gamma" -> ("http://c", 3.0)))

    // conflict on alpha/beta updates them; delta inserts
    val batch2 = Seq(("alpha", "http://a2", 10.0), ("beta", "http://b2", 20.0),
        ("delta", "http://d", 4.0))
      .toDF("store_name", "store_url", "price").repartition(3)
    JdbcMergeSink.upsert(batch2, url, "store", Seq("store_name"),
      updateCols = Seq("store_url", "price"), props, dialect = dialect)
    assert(queryStore() == Map("alpha" -> ("http://a2", 10.0),
      "beta" -> ("http://b2", 20.0), "gamma" -> ("http://c", 3.0),
      "delta" -> ("http://d", 4.0)))

    // M5 replay idempotency: re-running an identical batch is a no-op
    JdbcMergeSink.upsert(batch2, url, "store", Seq("store_name"),
      updateCols = Seq("store_url", "price"), props, dialect = dialect)
    assert(queryStore().size == 4)
  }

  test("M2 insert-if-absent: existing rows keep their values") {
    import spark.implicits._
    val probe = Seq(("alpha", "http://SHOULD_NOT_WIN", 99.0),
        ("epsilon", "http://e", 5.0))
      .toDF("store_name", "store_url", "price")
    JdbcMergeSink.upsert(probe, url, "store", Seq("store_name"),
      updateCols = Seq.empty, props, dialect = dialect)
    val rows = queryStore()
    assert(rows("alpha") == ("http://a2", 10.0)) // untouched
    assert(rows("epsilon") == ("http://e", 5.0)) // inserted
  }

  test("failed partition rolls back atomically and drops its staging table") {
    import spark.implicits._
    // NULL into the NOT NULL primary key → the merge statement fails;
    // the partition's transaction must roll back the staged rows AND the
    // staging DDL (Derby DDL is transactional), leaving no debris
    val bad = Seq((null.asInstanceOf[String], "http://x", 7.0))
      .toDF("store_name", "store_url", "price").coalesce(1)
    intercept[Exception] {
      JdbcMergeSink.upsert(bad, url, "store", Seq("store_name"),
        updateCols = Seq("store_url"), props, dialect = dialect)
    }
    assert(queryStore().size == 5) // table unchanged
    val staging = withConn { c =>
      val rs = c.getMetaData.getTables(null, null, "%STAGING%", null)
      val names = Seq.newBuilder[String]
      while (rs.next()) names += rs.getString("TABLE_NAME")
      names.result()
    }
    assert(staging.isEmpty, s"staging debris: $staging")
  }
}

/** Derby-MERGE instance of the dialect-parameterized live behaviors —
  * the executable proxy for the Postgres staged merge (see
  * [[JdbcLiveMergeBehaviors]]).
  */
class JdbcLiveMergeSpec extends JdbcLiveMergeBehaviors(
  JdbcMergeSink.DerbyDialect, "jdbc:derby:memory:graftmerge;create=true")
