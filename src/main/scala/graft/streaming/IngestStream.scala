package graft.streaming

import graft.plans.{Ingestion, WarehouseStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The reference's full warehouse-ingestion main as a Structured
  * Streaming pipeline (SURVEY.md §2.8 + §3.2): drop directory of .xlsx
  * workbooks → one micro-batch per FILE ([[FileDrop]] semantics:
  * maxFilesPerTrigger=1 ≙ one transaction per file,
  * `import_files_to_postgre.py:136-237`) → the [[Ingestion]] plan against
  * the parquet-backed warehouse → stage-and-swap commit
  * ([[WarehouseStore]]) → archive or quarantine the file.
  *
  * Restart safety: the checkpoint skips committed batches; a batch that
  * half-ran before a crash re-runs and the J5 dedup gate makes the replay
  * a no-op for already-committed facts — same end state as the
  * reference's rollback, without needing one.
  */
object IngestStream {

  private val binaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Drain `inputDir` (AvailableNow), ingesting each workbook into the
    * warehouse at `warehouseDir`. Returns (processed, errored) file
    * counts like the reference's main loop.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, warehouseDir: String,
                      processedDir: String, errorsDir: String,
                      checkpointDir: String): (Long, Long) = {
    val cfg = FileDrop.Config(
      inputDir = inputDir, format = "binaryFile", schema = binaryFileSchema,
      processedDir = processedDir, errorsDir = errorsDir,
      checkpointDir = checkpointDir, pathGlob = "*.xlsx")
    FileDrop.runAvailableNow(spark, cfg) { (batch, _) =>
      val files = batch.select("path").distinct().collect().map(_.getString(0))
      files.foreach { file =>
        val wh = WarehouseStore.load(spark, warehouseDir)
        val next = Ingestion.ingestWorkbooks(spark, file, wh)
        WarehouseStore.save(spark, next, warehouseDir)
      }
    }
  }
}
