package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * getOrCreate dedupes across suites in the forked test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sqlc = spark.sqlContext

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

/** SQL-frontend smoke: registered views + native functions drive the
  * engine through plain spark.sql.
  */
class SqlFrontendSpec extends SparkSpec {
  test("registerSql exposes tables and native functions to SQL") {
    Engine.registerSql(spark, sf())
    val r = spark.sql("""
      SELECT l_returnflag, count(*) AS n, hash60(l_returnflag) AS h
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    assert(r.length >= 2 && r.forall(_.getLong(2) >= 0))
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
