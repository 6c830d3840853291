package graft

/** Throwaway round-13 scratch: run a named query at a given sf dir
  * and print its rows — for cross-checking Python twins before
  * fixture generation. Deleted before round end.
  */
object ScratchR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val q = if (args.length > 1) args(1) else "q310_parquet_write_corpus"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      rows.sortBy(_.get(0).toString).foreach { r =>
        println("SCRATCH " + (0 until r.length)
          .map(i => String.valueOf(r.get(i))).mkString(" | "))
      }
    } finally spark.stop()
  }
}
