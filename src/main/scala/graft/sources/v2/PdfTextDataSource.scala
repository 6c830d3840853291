package graft.sources.v2

import java.util

import graft.sources.PdfParser
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 PDF text connector (SURVEY.md §2.1 S1 as a first-class
  * source rather than binaryFile + expression):
  *
  * {{{ spark.read.format("pdftext").load("/statements/dir") }}}
  *
  * One row per document: `_file`, `text` (all pages concatenated — the
  * reference's `page.get_text()` loop, pdf_to_xlsx.py:27-30). One
  * InputPartition per file; extraction runs on executors.
  */
class PdfTextDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pdftext"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PdfTextDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PdfTextTable(new CaseInsensitiveStringMap(properties))
}

object PdfTextDataSource {
  val schema: StructType = StructType(Seq(
    StructField("_file", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private[v2] def listFiles(o: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(o.get("path")).getOrElse(
      throw new IllegalArgumentException("pdftext source requires a load path"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val all =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq.map(_.getPath)
      else Seq(p)
    all.filter(_.getName.toLowerCase.endsWith(".pdf")).map(_.toString).sorted
  }
}

private[v2] class PdfTextTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"pdftext:${options.get("path")}"
  override def schema(): StructType = PdfTextDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new PdfTextScan(options)
}

private[v2] class PdfTextScan(options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = PdfTextDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PdfTextDataSource.listFiles(options)
      .map(f => XlsxInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    PdfTextReaderFactory()
}

private[v2] case class PdfTextReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = partition.asInstanceOf[XlsxInputPartition].file
      private var done = false
      private var current: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          val text = PdfParser.extractText(XlsxDataSource.readBytes(file))
          current = new GenericInternalRow(Array[Any](
            UTF8String.fromString(file), UTF8String.fromString(text)))
          done = true
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
