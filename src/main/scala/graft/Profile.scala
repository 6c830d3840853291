package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): runs the
  * named queries (or the headline set) N times each and prints per-run
  * seconds — run 1 includes planning + whole-stage-codegen compilation,
  * later runs are steady-state execution, so the gap is the fixed
  * per-query overhead Bench pays at n=1.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.headline
    // session warm-up
    SparkEntry.queries(SparkEntry.headline.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        Checkpoints.release() // per-rep, like Bench
        elapsed
      }
      println(f"[profile] $name: " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
