package graft.sources

import java.io.ByteArrayInputStream
import java.time.LocalDate
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Pure-JVM .xlsx (OOXML spreadsheet) parser — java.util.zip + StAX only,
  * no external deps. Runs per-file on executors; one workbook is bounded
  * by its zip size, so full materialization per file is safe while the
  * fleet of files provides the parallelism.
  *
  * Re-expresses the reference's two Excel readers (SURVEY.md §2.1 S2/S3):
  * pandas `read_excel(sheet_name=...)` at
  * `import_files_to_postgre.py:253-255` and the openpyxl hyperlink walk at
  * `import_files_to_postgre.py:45-65` — one parse emits both the cell
  * values and the per-cell hyperlink targets (the reference parses the
  * same file twice; see SURVEY.md §4.1 "double-parse avoidance").
  */
object XlsxParser {

  /** One parsed cell: 0-based column index, display value (shared strings
    * resolved, date-styled serials rendered ISO), optional hyperlink.
    */
  final case class Cell(col: Int, value: String, hyperlink: Option[String])

  /** One sheet: name plus rows in source order (sheet row number → cells).
    * Source row order is load-bearing downstream (forward-fill W1 and the
    * positional hyperlink zip W3 — SURVEY.md §2.5).
    */
  final case class Sheet(name: String, rows: Vector[(Int, Vector[Cell])])

  private val xif = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f
  }

  /** Excel epoch (1900 date system): serial 1 = 1900-01-01, with the
    * fictitious 1900-02-29 → day 0 is 1899-12-30.
    */
  private val excelEpoch = LocalDate.of(1899, 12, 30)

  def sheetNames(bytes: Array[Byte]): Seq[String] = {
    val entries = unzip(bytes, Set("xl/workbook.xml"))
    workbookSheets(entries("xl/workbook.xml")).map(_._1)
  }

  /** Parse one named sheet (values + hyperlinks), resolving shared
    * strings and date styles from the workbook parts.
    */
  def parseSheet(bytes: Array[Byte], sheetName: String): Sheet = {
    val all = unzip(bytes, names = Set.empty) // all xl/ XML parts (sheet path unknown yet)
    val wb = all.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val sheets = workbookSheets(wb)
    val rid = sheets.collectFirst { case (n, id) if n == sheetName => id }
      .getOrElse(throw new IllegalArgumentException(
        s"sheet '$sheetName' not in ${sheets.map(_._1).mkString(",")}"))
    val rels = relationships(all.getOrElse("xl/_rels/workbook.xml.rels", Array.empty))
    val target = rels.getOrElse(rid,
      throw new IllegalArgumentException(s"no relationship for sheet id $rid"))
    val sheetPath = resolvePart("xl", target)
    val sst = all.get("xl/sharedStrings.xml").map(sharedStrings).getOrElse(Vector.empty)
    val dateStyles = all.get("xl/styles.xml").map(dateStyleIndexes).getOrElse(Set.empty)
    val relsPath = {
      val i = sheetPath.lastIndexOf('/')
      sheetPath.take(i + 1) + "_rels/" + sheetPath.drop(i + 1) + ".rels"
    }
    val linkTargets = all.get(relsPath).map(relationships).getOrElse(Map.empty)
    parseSheetXml(all(sheetPath), sheetName, sst, dateStyles, linkTargets)
  }

  // ------------------------------------------------------------------ zip

  private def unzip(bytes: Array[Byte], names: Set[String]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    try {
      var e = zis.getNextEntry
      while (e != null) {
        val n = e.getName
        if (!e.isDirectory && n.startsWith("xl/") &&
          (n.endsWith(".xml") || n.endsWith(".rels")) &&
          (names.isEmpty || names.contains(n)) && !n.startsWith("xl/media/"))
          out(n) = zis.readAllBytes()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  private def resolvePart(base: String, target: String): String =
    if (target.startsWith("/")) target.drop(1)
    else base + "/" + target

  // ------------------------------------------------------------ workbook

  /** (sheet name, r:id) in workbook order. */
  private def workbookSheets(xml: Array[Byte]): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer[(String, String)]()
    foreachElement(xml) { r =>
      if (r.getLocalName == "sheet") {
        val name = attr(r, "name")
        val rid = attr(r, "id") // r:id, namespace-unaware → local name "id"
        if (name != null && rid != null) out += ((name, rid))
      }
    }
    out.toSeq
  }

  /** rels part → Id → Target. */
  private def relationships(xml: Array[Byte]): Map[String, String] = {
    if (xml.isEmpty) return Map.empty
    val out = mutable.Map[String, String]()
    foreachElement(xml) { r =>
      if (r.getLocalName == "Relationship")
        out(attr(r, "Id")) = attr(r, "Target")
    }
    out.toMap
  }

  /** Shared-string table: concatenated text of all <t> under each <si>
    * (rich-text runs collapse, matching pandas/openpyxl).
    */
  private def sharedStrings(xml: Array[Byte]): Vector[String] = {
    val out = mutable.ArrayBuffer[String]()
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    var cur: java.lang.StringBuilder = null
    var inT = false
    try while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new java.lang.StringBuilder()
          case "t" => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT && cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => out += cur.toString; cur = null
          case "t" => inT = false
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    out.toVector
  }

  /** Style (cellXfs xf) indexes whose number format is a date/time format:
    * builtin ids 14-22 and 45-47, or a custom format whose code contains
    * date tokens (y/m/d/h/s outside [] and "" sections).
    */
  private def dateStyleIndexes(xml: Array[Byte]): Set[Int] = {
    val customDate = mutable.Set[Int]()
    val xfFmts = mutable.ArrayBuffer[Int]()
    var inCellXfs = false
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    try while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = attr(r, "numFmtId").toInt
            if (isDateFormatCode(attr(r, "formatCode"))) customDate += id
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfFmts += Option(attr(r, "numFmtId")).map(_.toInt).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    } finally r.close()
    xfFmts.zipWithIndex.collect {
      case (fmt, i) if (fmt >= 14 && fmt <= 22) || (fmt >= 45 && fmt <= 47) ||
        customDate.contains(fmt) => i
    }.toSet
  }

  private def isDateFormatCode(code: String): Boolean = {
    if (code == null) return false
    // strip [..] sections and quoted literals, then look for date tokens
    val bare = code.replaceAll("\\[[^\\]]*\\]", "").replaceAll("\"[^\"]*\"", "")
    bare.exists(c => "ymdhs".indexOf(c.toLower) >= 0) && !bare.contains('#')
  }

  // --------------------------------------------------------------- sheet

  private def parseSheetXml(xml: Array[Byte], name: String, sst: Vector[String],
                            dateStyles: Set[Int],
                            linkTargets: Map[String, String]): Sheet = {
    val rows = mutable.ArrayBuffer[(Int, mutable.ArrayBuffer[Cell])]()
    val linksByRef = mutable.Map[String, String]() // cell ref -> url
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    var curRow: mutable.ArrayBuffer[Cell] = null
    var cellRef: String = null
    var cellType: String = null
    var cellStyle: Int = -1
    var inV = false
    var inIsT = false
    var v: java.lang.StringBuilder = null
    try while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            curRow = mutable.ArrayBuffer[Cell]()
            rows += ((Option(attr(r, "r")).map(_.toInt).getOrElse(rows.size + 1), curRow))
          case "c" =>
            cellRef = attr(r, "r")
            cellType = Option(attr(r, "t")).getOrElse("n")
            cellStyle = Option(attr(r, "s")).map(_.toInt).getOrElse(-1)
            v = new java.lang.StringBuilder()
          case "v" => inV = true
          case "t" => inIsT = true // inline string <is><t>
          case "hyperlink" =>
            val ref = attr(r, "ref")
            val rid = attr(r, "id")
            val loc = attr(r, "location")
            val tgt = if (rid != null) linkTargets.get(rid) else Option(loc)
            tgt.foreach(t => linksByRef(ref) = t)
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if ((inV || (inIsT && cellType == "inlineStr")) && v != null) v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" =>
            if (curRow != null && cellRef != null) {
              // keep null-valued cells too: the trailing <hyperlinks>
              // section may attach a link to an otherwise-empty cell
              val value = cellValue(cellType, v.toString, cellStyle, sst, dateStyles)
              curRow += Cell(colIndex(cellRef), value, None)
            }
            cellRef = null; cellType = null; v = null
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    // attach hyperlinks (the <hyperlinks> section trails <sheetData>)
    val withLinks = rows.map { case (rn, cells) =>
      (rn, cells.map { c =>
        val ref = colRef(c.col) + rn
        linksByRef.get(ref) match {
          case some @ Some(_) => c.copy(hyperlink = some)
          case None => c
        }
      }.toVector)
    }
    Sheet(name, withLinks.toVector)
  }

  private def cellValue(t: String, raw: String, style: Int,
                        sst: Vector[String], dateStyles: Set[Int]): String =
    t match {
      case _ if raw.isEmpty => null
      case "s" => sst(raw.trim.toInt)
      case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
      case "e" => null // error cell (#DIV/0! etc.) → null, like pandas NaN
      case "inlineStr" | "str" => raw
      case _ => // numeric; date-styled serials render ISO like pandas does
        if (dateStyles.contains(style)) serialToIso(raw) else trimNum(raw)
    }

  /** Drop a redundant trailing ".0" so integer-valued cells print the way
    * pandas' int64 inference does ("45369", not "45369.0").
    */
  private def trimNum(raw: String): String = {
    val s = raw.trim
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def serialToIso(raw: String): String = {
    val d = try raw.trim.toDouble catch { case _: NumberFormatException => return raw }
    val days = math.floor(d).toLong
    val date = excelEpoch.plusDays(days)
    val frac = d - days
    if (frac < 1e-9) date.toString
    else {
      val secs = math.round(frac * 86400)
      f"$date ${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d"
    }
  }

  /** "J2" → 0-based column index 9. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** 0-based column index → letters ("J"). */
  private[graft] def colRef(col: Int): String = {
    var c = col + 1; val sb = new StringBuilder
    while (c > 0) { val rem = (c - 1) % 26; sb.insert(0, ('A' + rem).toChar); c = (c - 1) / 26 }
    sb.toString
  }

  /** Run `f` at every START_ELEMENT of a StAX scan over `xml`. */
  private def foreachElement(xml: Array[Byte])(f: XMLStreamReader => Unit): Unit = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT) f(r)
    } finally r.close()
  }

  /** Attribute lookup by local name. The factory is namespace-unaware, so
    * names arrive raw ("r:id") — match the bare name or any prefix:name.
    */
  private def attr(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      val n = r.getAttributeLocalName(i)
      if (n == local || n.endsWith(":" + local)) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
