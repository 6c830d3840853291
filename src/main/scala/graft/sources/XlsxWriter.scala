package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal .xlsx writer (SURVEY.md §2.1 S7) — the reference writes a
  * two-sheet workbook via `pd.ExcelWriter` (`pdf_to_xlsx.py:126-128`).
  *
  * This is a DRIVER-SIDE parity sink: each sheet's DataFrame is collected,
  * so it is only for reference-scale outputs (statement extracts, report
  * workbooks — the reference's own files are ≤90 rows). The engine-native
  * sink at scale is `df.write.parquet`; this exists so a reference user
  * keeps their .xlsx artifacts. The fence is enforced, not advisory:
  * sheets over `maxRowsPerSheet` (default 65 536; hard ceiling at the
  * xlsx format's 1 048 576) abort mid-stream BEFORE the driver drains an
  * unbounded iterator — a scale path reaching this sink is a bug, never
  * a silent driver OOM.
  *
  * Inline strings only (no shared-string table) — single-pass streaming
  * write, and [[XlsxParser]] round-trips it.
  */
object XlsxWriter {

  /** xlsx format ceiling (rows per sheet, header included). */
  val XlsxRowLimit: Int = 1 << 20

  def write(path: String, sheets: Seq[(String, DataFrame)],
            maxRowsPerSheet: Int = 1 << 16): Unit = {
    // strict: the header row occupies one of the format's rows, so the
    // data-row guard must leave room for it
    require(maxRowsPerSheet < XlsxRowLimit,
      s"maxRowsPerSheet $maxRowsPerSheet must leave header room under the xlsx format limit $XlsxRowLimit")
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      put(zos, "[Content_Types].xml", contentTypes(sheets.size))
      put(zos, "_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin)
      put(zos, "xl/workbook.xml", workbookXml(sheets.map(_._1)))
      put(zos, "xl/_rels/workbook.xml.rels", workbookRels(sheets.size))
      put(zos, "xl/styles.xml", stylesXml)
      sheets.zipWithIndex.foreach { case ((name, df), i) =>
        put(zos, s"xl/worksheets/sheet${i + 1}.xml",
          sheetXml(df, name, maxRowsPerSheet))
      }
    } finally zos.close()
  }

  private def put(zos: ZipOutputStream, name: String, content: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(content.getBytes(StandardCharsets.UTF_8))
    zos.closeEntry()
  }

  private def contentTypes(n: Int): String = {
    val sheets = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$sheets</Types>""".stripMargin
  }

  private def workbookXml(names: Seq[String]): String = {
    val sheets = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheets</sheets></workbook>""".stripMargin
  }

  private def workbookRels(n: Int): String = {
    val rels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString
    val styles =
      s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels$styles</Relationships>""".stripMargin
  }

  /** Minimal stylesheet: style index 1 = builtin date format (numFmt 14),
    * used for DateType/TimestampType cells so Excel consumers see real
    * dates (the reference's openpyxl sink writes serials the same way).
    */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fonts count="1"><font/></fonts><fills count="1"><fill/></fills><borders count="1"><border/></borders><cellStyleXfs count="1"><xf/></cellStyleXfs><cellXfs count="2"><xf numFmtId="0" applyNumberFormat="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>""".stripMargin

  /** Days since the Excel 1900-system epoch (1899-12-30). */
  private def toSerial(d: java.time.LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), d)

  private def sheetXml(df: DataFrame, sheetName: String,
                       maxRows: Int): String = {
    val fields = df.schema.fields
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def row(rn: Int, cells: Seq[(Int, String)]): Unit = {
      sb ++= s"""<row r="$rn">"""
      cells.foreach { case (ci, xml) => sb ++= xml }
      sb ++= "</row>"
    }
    // header row
    row(1, fields.indices.map(i =>
      i -> inlineStr(XlsxParser.colRef(i) + "1", fields(i).name)))
    var rn = 2
    df.toLocalIterator().forEachRemaining { r =>
      if (rn - 1 > maxRows)
        throw new IllegalStateException(
          s"sheet '$sheetName' exceeds the $maxRows-row parity-sink fence; " +
            "XlsxWriter is the driver-side parity sink for reference-scale " +
            "workbooks — write parquet for scale outputs")
      val cells = fields.indices.flatMap { i =>
        if (r.isNullAt(i)) None
        else {
          val ref = XlsxParser.colRef(i) + rn
          val cell = fields(i).dataType match {
            case _: NumericType => s"""<c r="$ref"><v>${r.get(i)}</v></c>"""
            case BooleanType =>
              s"""<c r="$ref" t="b"><v>${if (r.getBoolean(i)) 1 else 0}</v></c>"""
            case DateType =>
              val serial = toSerial(r.getDate(i).toLocalDate)
              s"""<c r="$ref" s="1"><v>$serial</v></c>"""
            case TimestampType =>
              val ts = r.getTimestamp(i).toLocalDateTime
              val serial = toSerial(ts.toLocalDate) +
                ts.toLocalTime.toSecondOfDay / 86400.0
              s"""<c r="$ref" s="1"><v>$serial</v></c>"""
            case _ => inlineStr(ref, String.valueOf(r.get(i)))
          }
          Some(i -> cell)
        }
      }
      row(rn, cells)
      rn += 1
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  private def inlineStr(ref: String, s: String): String =
    s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(s)}</t></is></c>"""

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '&' => sb ++= "&amp;"
      case '"' => sb ++= "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => // drop illegal XML chars
      case c => sb += c
    }
    sb.toString
  }
}
