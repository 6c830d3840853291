package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. Each query is forced through the
  * `noop` sink: unlike `count()`, noop materializes every output column, so
  * Catalyst cannot prune the projections being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // JVM/codegen warm-up on the smallest query so the first timed query
    // doesn't absorb classloading + whole-stage-codegen compilation cost.
    try queries(SparkEntry.headline.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.headline.map { name =>
      val t0 = System.nanoTime()
      try queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sf = sfDir.split("/").reverseIterator
      .collectFirst { case s if s.startsWith("sf") => s.drop(2) }.getOrElse("?")
    println(f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":$sf}""")
    spark.stop()
  }
}
