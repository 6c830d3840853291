package graft

import graft.sources.JdbcMergeSink
import org.scalatest.funsuite.AnyFunSuite

/** Staged-merge SQL generation (S8/M1-M5). The IO path needs a live
  * database; the statement set is the testable contract.
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
