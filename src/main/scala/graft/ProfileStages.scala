package graft

/** Scratch stage-breakdown main (not part of the driver contract):
  * decomposes q102 into its clean stage vs the full prefix-sum build,
  * for SCALE.md bench adjudication.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("stage-profile")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stage] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    SparkEntry.queries("q102_curation_pipeline")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Checkpoints.release()
    for (_ <- 1 to 3) {
      time("clean_stage_only")(
        graft.queries.CurationQueries.q102CleanStage(spark, dir).count())
      Checkpoints.release()
      time("full_q102")(
        SparkEntry.queries("q102_curation_pipeline")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      Checkpoints.release()
    }
    spark.stop()
  }
}
