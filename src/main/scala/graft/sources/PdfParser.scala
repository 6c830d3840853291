package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable

/** Pure-JVM PDF text extractor — java.util.zip.Inflater only, no external
  * deps. Scope: classic (non-xref-stream) PDFs with FlateDecode content
  * streams, simple + Type0/CID fonts with ToUnicode CMaps — the statement
  * documents of the reference corpus (SURVEY.md §2.1 S1; the reference
  * uses PyMuPDF `page.get_text()`, `pdf_to_xlsx.py:27-30`).
  *
  * Output contract: one line per text-positioning run, pages joined with
  * "\n" — enough structure for the downstream regex carve/tokenize
  * operators (F6/F7), which only require token ORDER and `\s+` gaps.
  *
  * Runs per-file on executors (see [[graft.plans.Statements]]); a single
  * statement PDF is MBs at most, so per-file materialization is safe and
  * the file fleet provides the parallelism.
  */
object PdfParser {

  // ------------------------------------------------------------- model

  sealed trait PdfVal
  case class PNum(v: Double) extends PdfVal
  case class PName(v: String) extends PdfVal
  case class PStr(v: Array[Byte]) extends PdfVal
  case class PArr(v: Vector[PdfVal]) extends PdfVal
  case class PDict(v: Map[String, PdfVal]) extends PdfVal
  case class PRef(num: Int) extends PdfVal
  case class PBool(v: Boolean) extends PdfVal
  case object PNull extends PdfVal

  private[sources] case class PdfObj(dict: PDict, stream: Option[Array[Byte]])

  /** Extract all text of the document, pages in page-tree order, joined
    * with a newline after each page (mirroring the reference's
    * `text += page.get_text() + "\n"`).
    */
  def extractText(bytes: Array[Byte]): String = {
    val objs = scanObjects(bytes)
    def deref(v: PdfVal): PdfVal = v match {
      case PRef(n) => objs.get(n).map(o => o.dict: PdfVal).getOrElse(PNull)
      case other => other
    }
    def derefObj(v: PdfVal): Option[PdfObj] = v match {
      case PRef(n) => objs.get(n)
      case _ => None
    }

    // trailer → /Root → /Pages → Kids walk
    val trailerIdx = lastIndexOf(bytes, "trailer")
    val root = if (trailerIdx >= 0) {
      val lex = new Lexer(bytes, trailerIdx + 7)
      lex.nextValue() match {
        case PDict(m) => m.get("Root")
        case _ => None
      }
    } else None
    val catalog = root.map(deref)
    val pagesRoot = catalog match {
      case Some(PDict(m)) => m.get("Pages")
      case _ => None
    }
    // pages carry their nearest /Resources (the entry is inheritable
    // through the page tree)
    val pageObjs = mutable.ArrayBuffer[(PDict, PdfVal)]()
    def walk(v: PdfVal, inheritedRes: PdfVal, depth: Int): Unit =
      if (depth < 64) deref(v) match {
        case d @ PDict(m) =>
          val res = m.getOrElse("Resources", inheritedRes)
          m.get("Type") match {
            case Some(PName("Pages")) => m.get("Kids") match {
              case Some(PArr(kids)) => kids.foreach(walk(_, res, depth + 1))
              case _ =>
            }
            case Some(PName("Page")) => pageObjs += ((d, res))
            case _ =>
          }
        case _ =>
      }
    pagesRoot.foreach(walk(_, PNull, 0))
    // fallback: no page tree resolved → every /Type/Page in file order
    if (pageObjs.isEmpty)
      objs.toSeq.sortBy(_._1).foreach { case (_, o) =>
        if (o.dict.v.get("Type").contains(PName("Page")))
          pageObjs += ((o.dict, o.dict.v.getOrElse("Resources", PNull)))
      }

    val cmapCache = mutable.Map[Int, Map[Int, String]]()
    def fontMap(fontDict: PdfVal): (Boolean, Map[Int, String]) = deref(fontDict) match {
      case PDict(f) =>
        val twoByte = f.get("Subtype").contains(PName("Type0"))
        val cmap = f.get("ToUnicode") match {
          case Some(PRef(n)) => cmapCache.getOrElseUpdate(n,
            objs.get(n).flatMap(_.stream).map(s => parseCMap(inflateIfNeeded(objs(n), s)))
              .getOrElse(Map.empty))
          case _ => Map.empty[Int, String]
        }
        (twoByte, cmap)
      case _ => (false, Map.empty)
    }

    /** A /Resources dict → (font name → decode info, xobject name → obj). */
    def resolveResources(res: PdfVal): Resources = deref(res) match {
      case PDict(r) =>
        val fonts = deref(r.getOrElse("Font", PNull)) match {
          case PDict(fm) => fm.map { case (k, v) => k -> fontMap(v) }
          case _ => Map.empty[String, (Boolean, Map[Int, String])]
        }
        val xobjs = deref(r.getOrElse("XObject", PNull)) match {
          case PDict(xm) => xm.collect { case (k, PRef(n)) if objs.contains(n) => k -> objs(n) }
          case _ => Map.empty[String, PdfObj]
        }
        Resources(fonts, xobjs)
      case _ => Resources(Map.empty, Map.empty)
    }

    val sb = new StringBuilder
    pageObjs.foreach { case (page, res) =>
      val content: Array[Byte] = page.v.get("Contents") match {
        case Some(PArr(refs)) => refs.toArray.flatMap(r =>
          derefObj(r).flatMap(o => o.stream.map(s => inflateIfNeeded(o, s))).getOrElse(Array.empty[Byte]))
        case Some(r) => derefObj(r).flatMap(o => o.stream.map(s => inflateIfNeeded(o, s)))
          .getOrElse(Array.empty[Byte])
        case None => Array.empty[Byte]
      }
      renderContent(content, resolveResources(res), resolveResources, sb, 0)
      sb.append('\n')
    }
    sb.toString
  }

  private[sources] case class Resources(
      fonts: Map[String, (Boolean, Map[Int, String])],
      xobjs: Map[String, PdfObj])

  // ----------------------------------------------------- object scanning

  /** All `N G obj … endobj` objects by number (later wins, approximating
    * incremental-update precedence).
    */
  private def scanObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val out = mutable.Map[Int, PdfObj]()
    var i = 0
    while (i < bytes.length - 3) {
      if (bytes(i) == 'o' && bytes(i + 1) == 'b' && bytes(i + 2) == 'j' &&
        i > 0 && isWs(bytes(i - 1))) {
        // backtrack: "N G obj"
        var j = i - 1
        while (j > 0 && isWs(bytes(j))) j -= 1
        while (j > 0 && bytes(j).toChar.isDigit) j -= 1 // gen
        while (j > 0 && isWs(bytes(j))) j -= 1
        val numEnd = j + 1
        while (j >= 0 && bytes(j).toChar.isDigit) j -= 1
        val numStr = new String(bytes, j + 1, numEnd - j - 1, StandardCharsets.ISO_8859_1)
        if (numStr.nonEmpty) {
          val num = numStr.toInt
          val lex = new Lexer(bytes, i + 3)
          val dict = lex.nextValue() match {
            case d: PDict => d
            case _ => PDict(Map.empty)
          }
          // stream?
          lex.skipWs()
          val stream =
            if (lex.matches("stream")) {
              var s = lex.pos + 6
              if (bytes(s) == '\r') s += 1
              if (bytes(s) == '\n') s += 1
              val e = indexOf(bytes, "endstream", s)
              if (e > s) {
                var e2 = e
                if (e2 > s && bytes(e2 - 1) == '\n') e2 -= 1
                if (e2 > s && bytes(e2 - 1) == '\r') e2 -= 1
                Some(java.util.Arrays.copyOfRange(bytes, s, e2))
              } else None
            } else None
          out(num) = PdfObj(dict, stream)
        }
      }
      i += 1
    }
    out.toMap
  }

  private def inflateIfNeeded(obj: PdfObj, data: Array[Byte]): Array[Byte] =
    obj.dict.v.get("Filter") match {
      case Some(PName("FlateDecode")) => inflate(data)
      case Some(PArr(fs)) if fs.contains(PName("FlateDecode")) => inflate(data)
      case _ => data
    }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // corrupt tail
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: Exception => out.toByteArray }
    finally inf.end()
  }

  // ------------------------------------------------------------- lexer

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f'

  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Minimal PDF value lexer/parser over a byte window. */
  private final class Lexer(val bytes: Array[Byte], var pos: Int) {

    def skipWs(): Unit = {
      while (pos < bytes.length && (isWs(bytes(pos)) || bytes(pos) == '%')) {
        if (bytes(pos) == '%') { // comment to EOL
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else pos += 1
      }
    }

    def matches(s: String): Boolean =
      pos + s.length <= bytes.length &&
        (0 until s.length).forall(k => bytes(pos + k) == s.charAt(k).toByte)

    def nextValue(): PdfVal = {
      skipWs()
      if (pos >= bytes.length) return PNull
      bytes(pos) match {
        case '<' if pos + 1 < bytes.length && bytes(pos + 1) == '<' => dict()
        case '<' => hexString()
        case '(' => literalString()
        case '/' => name()
        case '[' => array()
        case 't' if matches("true") => pos += 4; PBool(true)
        case 'f' if matches("false") => pos += 5; PBool(false)
        case 'n' if matches("null") => pos += 4; PNull
        case b if b.toChar.isDigit || b == '+' || b == '-' || b == '.' => numberOrRef()
        case _ => pos += 1; PNull // unknown token byte — skip
      }
    }

    private def dict(): PdfVal = {
      pos += 2
      val m = mutable.Map[String, PdfVal]()
      while (pos < bytes.length) {
        skipWs()
        if (matches(">>")) { pos += 2; return PDict(m.toMap) }
        if (bytes(pos) != '/') { pos += 1 } // resync
        else {
          val k = name() match { case PName(n) => n; case _ => "" }
          val v = nextValue()
          m(k) = v
        }
      }
      PDict(m.toMap)
    }

    private def array(): PdfVal = {
      pos += 1
      val out = mutable.ArrayBuffer[PdfVal]()
      while (pos < bytes.length) {
        skipWs()
        if (bytes(pos) == ']') { pos += 1; return PArr(out.toVector) }
        out += nextValue()
      }
      PArr(out.toVector)
    }

    private def name(): PdfVal = {
      pos += 1
      val sb = new StringBuilder
      while (pos < bytes.length && !isWs(bytes(pos)) && !isDelim(bytes(pos))) {
        if (bytes(pos) == '#' && pos + 2 < bytes.length) {
          sb += Integer.parseInt(new String(bytes, pos + 1, 2, StandardCharsets.ISO_8859_1), 16).toChar
          pos += 3
        } else { sb += bytes(pos).toChar; pos += 1 }
      }
      PName(sb.toString)
    }

    private def numberOrRef(): PdfVal = {
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos)) && !isDelim(bytes(pos))) pos += 1
      val tok = new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1)
      val save = pos
      // "N G R" indirect reference lookahead
      if (tok.forall(_.isDigit)) {
        skipWs()
        val gStart = pos
        while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
        if (pos > gStart) {
          skipWs()
          if (pos < bytes.length && bytes(pos) == 'R' &&
            (pos + 1 >= bytes.length || isWs(bytes(pos + 1)) || isDelim(bytes(pos + 1)))) {
            pos += 1
            return PRef(tok.toInt)
          }
        }
        pos = save
      }
      PNum(tok.toDoubleOption.getOrElse(0.0))
    }

    private def hexString(): PdfVal = {
      pos += 1
      val sb = new StringBuilder
      while (pos < bytes.length && bytes(pos) != '>') {
        val c = bytes(pos).toChar
        if (!c.isWhitespace) sb += c
        pos += 1
      }
      pos += 1
      val hex = if (sb.length % 2 == 1) sb.toString + "0" else sb.toString
      PStr(hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
    }

    private def literalString(): PdfVal = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < bytes.length && depth > 0) {
        val b = bytes(pos)
        b match {
          case '\\' if pos + 1 < bytes.length =>
            val n = bytes(pos + 1).toChar
            n match {
              case 'n' => out.write('\n'); pos += 2
              case 'r' => out.write('\r'); pos += 2
              case 't' => out.write('\t'); pos += 2
              case 'b' => out.write('\b'); pos += 2
              case 'f' => out.write('\f'); pos += 2
              case '(' => out.write('('); pos += 2
              case ')' => out.write(')'); pos += 2
              case '\\' => out.write('\\'); pos += 2
              case '\r' => pos += 2; if (pos < bytes.length && bytes(pos) == '\n') pos += 1
              case '\n' => pos += 2
              case d if d.isDigit => // octal, up to 3 digits
                var v = 0; var k = 0
                pos += 1
                while (k < 3 && pos < bytes.length && bytes(pos).toChar.isDigit &&
                  bytes(pos) < '8') { v = v * 8 + (bytes(pos) - '0'); pos += 1; k += 1 }
                out.write(v & 0xff)
              case _ => out.write(n); pos += 2
            }
          case '(' => depth += 1; out.write('('); pos += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            pos += 1
          case _ => out.write(b); pos += 1
        }
      }
      PStr(out.toByteArray)
    }
  }

  // -------------------------------------------------------- CMap parse

  /** ToUnicode CMap → code → unicode string (bfchar + bfrange forms). */
  private[sources] def parseCMap(data: Array[Byte]): Map[Int, String] = {
    val text = new String(data, StandardCharsets.ISO_8859_1)
    val out = mutable.Map[Int, String]()
    def hex2str(h: String): String = {
      // UTF-16BE code units
      val cs = h.grouped(4).map(g => Integer.parseInt(g, 16).toChar).toArray
      new String(cs)
    }
    val bfchar = "(?s)beginbfchar(.*?)endbfchar".r
    val pair = "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
    bfchar.findAllMatchIn(text).foreach { m =>
      pair.findAllMatchIn(m.group(1)).foreach { p =>
        out(Integer.parseInt(p.group(1), 16)) = hex2str(p.group(2))
      }
    }
    val bfrange = "(?s)beginbfrange(.*?)endbfrange".r
    val triple = "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(<([0-9A-Fa-f]+)>|\\[(.*?)\\])".r
    bfrange.findAllMatchIn(text).foreach { m =>
      triple.findAllMatchIn(m.group(1)).foreach { t =>
        val lo = Integer.parseInt(t.group(1), 16)
        val hi = Integer.parseInt(t.group(2), 16)
        if (t.group(4) != null) {
          val dst = Integer.parseInt(t.group(4), 16)
          var c = lo
          while (c <= hi) { out(c) = hex2str(f"${dst + (c - lo)}%04x"); c += 1 }
        } else if (t.group(5) != null) {
          val dsts = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(t.group(5)).map(_.group(1)).toVector
          var c = lo
          while (c <= hi && (c - lo) < dsts.length) { out(c) = hex2str(dsts(c - lo)); c += 1 }
        }
      }
    }
    out.toMap
  }

  // --------------------------------------------------- content rendering

  /** Walk a content stream, decoding shown text with the current font's
    * byte width + ToUnicode map; text-positioning ops emit newlines;
    * `Do` on a Form XObject recurses into its stream with its own
    * resources (falling back to the caller's).
    */
  private def renderContent(content: Array[Byte],
                            res: Resources,
                            resolve: PdfVal => Resources,
                            sb: StringBuilder,
                            depth: Int): Unit = {
    if (depth > 16) return
    val fonts = res.fonts
    val lex = new Lexer(content, 0)
    var curFont: (Boolean, Map[Int, String]) = (false, Map.empty)
    var lastName: String = null
    val pending = mutable.ArrayBuffer[PdfVal]()
    var lineHasText = false
    def newline(): Unit = if (lineHasText) { sb.append('\n'); lineHasText = false }
    def emit(bytesS: Array[Byte]): Unit = {
      val (twoByte, cmap) = curFont
      val s = new StringBuilder
      if (twoByte) {
        var i = 0
        while (i + 1 < bytesS.length) {
          val code = ((bytesS(i) & 0xff) << 8) | (bytesS(i + 1) & 0xff)
          cmap.get(code).foreach(s ++= _)
          i += 2
        }
      } else {
        bytesS.foreach { b =>
          val code = b & 0xff
          s ++= cmap.getOrElse(code, (code.toChar).toString)
        }
      }
      if (s.nonEmpty) { sb ++= s; lineHasText = true }
    }

    while (lex.pos < content.length) {
      lex.skipWs()
      if (lex.pos >= content.length) return
      val b = content(lex.pos)
      if (b == '(' || b == '<' || b == '[' || b == '/' ||
        b.toChar.isDigit || b == '+' || b == '-' || b == '.') {
        val v = lex.nextValue()
        v match {
          case PName(n) => lastName = n
          case _ =>
        }
        pending += v
      } else {
        // operator token
        val start = lex.pos
        while (lex.pos < content.length && !isWs(content(lex.pos)) &&
          !isDelim(content(lex.pos))) lex.pos += 1
        if (lex.pos == start) { lex.pos += 1 }
        else {
          val op = new String(content, start, lex.pos - start, StandardCharsets.ISO_8859_1)
          op match {
            case "Tf" =>
              if (lastName != null) curFont = fonts.getOrElse(lastName, (false, Map.empty))
            case "Tj" | "'" | "\"" =>
              pending.reverseIterator.collectFirst { case PStr(s) => s }.foreach(emit)
            case "TJ" =>
              pending.reverseIterator.collectFirst { case PArr(items) => items }
                .foreach(_.foreach { case PStr(s) => emit(s); case _ => })
            case "Td" | "TD" | "T*" | "Tm" | "BT" | "ET" => newline()
            case "Do" if lastName != null =>
              res.xobjs.get(lastName).foreach { xo =>
                val isForm = xo.dict.v.get("Subtype").contains(PName("Form"))
                if (isForm) xo.stream.foreach { s =>
                  newline()
                  val inner = xo.dict.v.get("Resources")
                    .map(resolve).filter(r => r.fonts.nonEmpty || r.xobjs.nonEmpty)
                    .getOrElse(res)
                  renderContent(inflateIfNeeded(xo, s), inner, resolve, sb, depth + 1)
                }
              }
            case _ =>
          }
          pending.clear()
          lastName = null
        }
      }
    }
  }

  // ------------------------------------------------------------ helpers

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = from
    while (i <= hay.length - n.length) {
      var k = 0
      while (k < n.length && hay(i + k) == n(k)) k += 1
      if (k == n.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String): Int = {
    var idx = -1
    var i = indexOf(hay, needle, 0)
    while (i >= 0) { idx = i; i = indexOf(hay, needle, i + 1) }
    idx
  }
}
