package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Scratch plan-evidence main (not part of the driver contract): the
  * q102/q161 dedup keeper sits UPSTREAM of localCheckpoint barriers
  * (the token budget checkpoints its input; q161 checkpoints uniq), so
  * the registered queries' final `.explain` never shows it — this tool
  * prints the keeper subplans themselves, in both spellings, over the
  * same gated input:
  *
  *  - BEFORE: the r2–r18 whole-row `min_by(struct(...), doc_id)`
  *    aggregate (reconstructed verbatim from the r18 source);
  *  - AFTER: the r19 two-phase winner recovery (hash-agg of
  *    (content hash → min doc_id) + broadcast LEFT SEMI join-back),
  *    plus the full q102CleanStage plan as shipped.
  */
object KeeperPlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $tag =====")
      println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
    }
    val d = graft.Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val kept = d.where(graft.operators.Curation.qualityLogit(col("text")) >= 0)
    // BEFORE (r18 spelling, reconstructed verbatim)
    show("q102_keeper_before (whole-row min_by struct)",
      kept.groupBy(md5(col("text")).as("__h"))
        .agg(min_by(struct(kept.columns.map(col): _*), col("doc_id"))
          .as("__r"))
        .select(col("__r.*")))
    // AFTER (r19 spelling, keeper subplan only — no checkpoint leaf, so
    // the winner subtree is visible end to end)
    val winners = kept.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    show("q102_keeper_after (hash-agg winners + broadcast semi)",
      kept.join(broadcast(winners), Seq("doc_id"), "left_semi"))
    // AFTER, as shipped (kept is a lazy checkpoint inside the stage)
    show("q102CleanStage_after (as shipped)",
      graft.queries.CurationQueries.q102CleanStage(spark, dir))
    graft.Checkpoints.release()
    spark.stop()
  }
}
