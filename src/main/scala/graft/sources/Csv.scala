package graft.sources

/** RFC 4180 CSV parse (the format's one public spec) — the
  * bread-and-butter ingestion format a corpus pipeline meets before
  * any lake exists. The hard part is not splitting on commas; it is
  * the QUOTING state machine: a quoted field may contain commas, CR,
  * LF, and doubled quotes, so record boundaries cannot be found with
  * a line split — a naive reader shears every quoted-newline row in
  * half and the row count silently doubles.
  *
  * Totality law (the house posture): structural damage is None,
  * never a throw and never partial garbage —
  *
  *  - an unclosed quote at EOF;
  *  - a bare `"` inside an unquoted field (RFC: fields containing
  *    quotes MUST be quoted);
  *  - bytes between a closing quote and the next separator/EOL;
  *  - a bare CR not followed by LF (records end CRLF, or bare LF
  *    accepted as the de-facto relaxation);
  *  - ragged rows (field count differing from the first row's).
  */
object Csv {

  /** Parse a complete UTF-8 CSV blob into rows of fields. The first
    * row is whatever the file says (callers treat it as the header).
    * A trailing record without a final newline is accepted, per RFC.
    */
  def parse(raw: Array[Byte]): Option[Vector[Vector[String]]] = {
    val s = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    val n = s.length
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    var nInRow = 0
    var nRows = 0
    var width = -1
    val f = new java.lang.StringBuilder
    // 0 = at field start, 1 = in unquoted, 2 = in quoted, 3 = just
    // after the closing quote
    var st = 0
    def endField(): Unit = {
      row += f.toString
      f.setLength(0)
      nInRow += 1
      st = 0
    }
    def endRow(): Boolean = {
      endField()
      if (width < 0) width = nInRow
      else if (nInRow != width) return false // ragged
      rows += row.result()
      row = Vector.newBuilder[String]
      nInRow = 0
      nRows += 1
      true
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      st match {
        case 0 => c match {
          case '"' => st = 2
          case ',' => endField()
          case '\n' => if (!endRow()) return None
          case '\r' =>
            if (i + 1 >= n || s.charAt(i + 1) != '\n') return None
            i += 1
            if (!endRow()) return None
          case _ => f.append(c); st = 1
        }
        case 1 => c match {
          case '"' => return None // bare quote mid-field
          case ',' => endField()
          case '\n' => if (!endRow()) return None
          case '\r' =>
            if (i + 1 >= n || s.charAt(i + 1) != '\n') return None
            i += 1
            if (!endRow()) return None
          case _ => f.append(c)
        }
        case 2 => c match {
          case '"' =>
            if (i + 1 < n && s.charAt(i + 1) == '"') {
              f.append('"'); i += 1
            } else st = 3
          case _ => f.append(c) // commas and CR/LF are data here
        }
        case _ => c match { // 3: after closing quote
          case ',' => endField()
          case '\n' => if (!endRow()) return None
          case '\r' =>
            if (i + 1 >= n || s.charAt(i + 1) != '\n') return None
            i += 1
            if (!endRow()) return None
          case _ => return None // junk after the closing quote
        }
      }
      i += 1
    }
    st match {
      case 2 => None // unclosed quote at EOF
      case 1 | 3 => if (endRow()) Some(rows.result()) else None
      case _ =>
        // at a fresh field start: EOF right after a separator means a
        // trailing empty field; EOF after a newline (or empty input)
        // means nothing pending
        if (nInRow > 0) { if (endRow()) Some(rows.result()) else None }
        else Some(rows.result())
    }
  }
}
