package graft

/** Throwaway round-13 scratch: print per-blob q310 md5s at a given sf
  * dir for cross-checking the Python twin. Deleted before round end.
  */
object ScratchR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val rows = graft.queries.WriterQueries.defs.toMap
        .apply("q310_parquet_write_corpus").build(spark, dir)
        .collect()
      rows.sortBy(_.getLong(0)).foreach { r =>
        println(s"SCRATCH blob=${r.getLong(0)} md5=${r.getString(1)} " +
          s"len=${r.getLong(2)} rows=${r.getLong(3)}")
      }
    } finally spark.stop()
  }
}
