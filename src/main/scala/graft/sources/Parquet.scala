package graft.sources

/** Byte-level parquet reader: trailer, thrift-compact FileMetaData,
  * v1 page headers, and PLAIN-encoded page payloads.
  *
  * Why the engine owns this: at lake scale the cheapest query is the
  * one that never reads data. A footprint audit over 100 TB of
  * OTHER systems' parquet (Spark's, pyarrow's, Impala's, anybody's)
  * needs row counts, per-column codecs, chunk offsets and sizes — all
  * of which live in the ~1 KB footer. Walking footers from raw bytes
  * makes that a scan-task map over (path, tail-bytes) pairs with zero
  * exchanges, instead of a full-file decode per member. The decode
  * path (PLAIN pages, none/gzip codecs) then proves the offsets are
  * real by reading values back out of the pages they point at.
  *
  * Format sources are public: the parquet-format thrift IDL
  * (FileMetaData / RowGroup / ColumnChunk / ColumnMetaData /
  * PageHeader) and the thrift compact-protocol spec (field-delta
  * headers, zigzag varints, size-prefixed lists). Nothing here links
  * against parquet-mr — ParquetSpec pins this walk AGAINST parquet-mr
  * and the q234/q235 oracles pin it against parquet-cpp (pyarrow).
  *
  * Totality law (the BMP/PNG/Avro posture): malformation — bad magic,
  * truncated trailer, thrift running past the footer, forged offsets,
  * a page that inflates to the wrong size — yields None, never a
  * throw and never partial garbage.
  */
object Parquet {

  /** Physical types (parquet.thrift `Type`). */
  val PhysInt32 = 1; val PhysInt64 = 2; val PhysDouble = 5
  val PhysByteArray = 6

  /** Codecs (parquet.thrift `CompressionCodec`). */
  val CodecNone = 0; val CodecGzip = 2

  /** Encodings (parquet.thrift `Encoding`). */
  val EncPlain = 0

  // ---- thrift compact protocol ----------------------------------------
  // Damage is signalled by one private, stackless exception: the walk
  // below is deeply recursive (struct skipping), and threading Options
  // through every varint read would bury the format logic. The throw
  // never escapes this object — both entry points catch it into None.
  private final class Damage extends RuntimeException(null, null, false, false)
  private def damage(): Nothing = throw new Damage

  /** Cursor over a byte slice; every read is bounds-checked. */
  private final class TC(b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos < 0 || pos >= end || pos >= b.length) damage()
      val v = b(pos) & 0xff; pos += 1; v
    }
    def uvarint(): Long = {
      var shift = 0; var v = 0L
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      damage()
    }
    def zigzag(): Long = { val z = uvarint(); (z >>> 1) ^ -(z & 1L) }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > end || pos + n > b.length) damage()
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def str(): String = {
      val n = uvarint()
      if (n > (1 << 20)) damage() // no megabyte "strings" in a footer
      new String(bytes(n.toInt), java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Walk one struct: `f(fieldId, tpe)` returns true if it consumed the
    * value; otherwise the value is skipped by type. Bounded depth.
    */
  private def struct(tc: TC, depth: Int)(f: (Int, Int) => Boolean): Unit = {
    if (depth > 16) damage()
    var lastId = 0
    var done = false
    while (!done) {
      val h = tc.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0x0f
        val delta = (h >> 4) & 0x0f
        val id = if (delta == 0) tc.zigzag().toInt else lastId + delta
        if (id <= 0) damage()
        lastId = id
        if (!f(id, tpe)) skipField(tc, tpe, depth)
      }
    }
  }

  /** Skip a FIELD value (bools live in the field-header nibble). */
  private def skipField(tc: TC, tpe: Int, depth: Int): Unit = tpe match {
    case 1 | 2 => () // bool: encoded in the header, no payload
    case t => skipElem(tc, t, depth)
  }

  /** Skip a LIST/MAP element value (bools are a full byte there). */
  private def skipElem(tc: TC, tpe: Int, depth: Int): Unit = tpe match {
    case 1 | 2 | 3 => tc.u8()
    case 4 | 5 | 6 => tc.uvarint()
    case 7 => tc.bytes(8)
    case 8 => val n = tc.uvarint(); if (n > (1 << 26)) damage(); tc.bytes(n.toInt)
    case 9 | 10 =>
      val (n, et) = listHeader(tc)
      var i = 0; while (i < n) { skipElem(tc, et, depth + 1); i += 1 }
    case 11 =>
      val n = tc.uvarint().toInt
      if (n < 0) damage()
      if (n > 0) {
        val kv = tc.u8()
        var i = 0
        while (i < n) {
          skipElem(tc, (kv >> 4) & 0x0f, depth + 1)
          skipElem(tc, kv & 0x0f, depth + 1)
          i += 1
        }
      }
    case 12 => struct(tc, depth + 1)((_, _) => false)
    case _ => damage()
  }

  private def listHeader(tc: TC): (Int, Int) = {
    val h = tc.u8()
    val et = h & 0x0f
    val sz = (h >> 4) & 0x0f
    val n = if (sz == 15) tc.uvarint().toInt else sz
    if (n < 0 || n > (1 << 24)) damage()
    (n, et)
  }

  private def i32(tc: TC, tpe: Int): Int = {
    if (tpe != 5) damage(); val v = tc.zigzag()
    if (v < Int.MinValue || v > Int.MaxValue) damage(); v.toInt
  }
  private def i64(tc: TC, tpe: Int): Long = { if (tpe != 6) damage(); tc.zigzag() }
  private def i32List(tc: TC, tpe: Int): Seq[Int] = {
    if (tpe != 9) damage()
    val (n, et) = listHeader(tc)
    if (et != 5) damage()
    Seq.fill(n)(tc.zigzag().toInt)
  }

  // ---- parquet footer ---------------------------------------------------

  case class SchemaElem(physType: Int, repetition: Int, name: String,
                        numChildren: Int)
  case class ColMeta(physType: Int, encodings: Seq[Int], path: String,
                     codec: Int, numValues: Long, totalUncompressed: Long,
                     totalCompressed: Long, dataPageOffset: Long,
                     dictPageOffset: Long)
  case class RowGroupMeta(cols: Seq[ColMeta], totalByteSize: Long,
                          numRows: Long)
  case class FileMeta(version: Int, schema: Seq[SchemaElem], numRows: Long,
                      rowGroups: Seq[RowGroupMeta], createdBy: String,
                      footerLen: Int) {
    /** Leaf column count (elements with no children, root excluded). */
    def numLeaves: Int = schema.count(_.numChildren == 0)

    /** Dotted leaf path → (max definition level, max repetition level),
      * reconstructed by the same DFS the schema list was flattened by:
      * each element owns the next `numChildren` elements; OPTIONAL adds
      * a definition level, REPEATED adds one of each.
      */
    def leafLevels: Map[String, (Int, Int)] = {
      val out = Map.newBuilder[String, (Int, Int)]
      var idx = 0
      def walk(prefix: String, defL: Int, repL: Int, root: Boolean): Unit = {
        if (idx >= schema.length) damage()
        val e = schema(idx); idx += 1
        val d = if (root) 0 else defL + (if (e.repetition != 0) 1 else 0)
        val r = if (root) 0 else repL + (if (e.repetition == 2) 1 else 0)
        val path = if (root || prefix.isEmpty) e.name
                   else prefix + "." + e.name
        if (root) {
          var i = 0
          while (i < e.numChildren) { walk("", d, r, root = false); i += 1 }
        } else if (e.numChildren == 0) out += path -> ((d, r))
        else {
          var i = 0
          while (i < e.numChildren) { walk(path, d, r, root = false); i += 1 }
        }
      }
      walk("", 0, 0, root = true)
      if (idx != schema.length) damage() // children counts must tile exactly
      out.result()
    }
  }

  /** Parse the trailer + thrift FileMetaData of a complete parquet file.
    * Layout: "PAR1" … data … [FileMetaData thrift][LE32 len]"PAR1".
    */
  def parseFooter(b: Array[Byte]): Option[FileMeta] = {
    try {
      val n = b.length
      if (n < 12) return None
      def magicAt(i: Int) = b(i) == 'P' && b(i + 1) == 'A' &&
        b(i + 2) == 'R' && b(i + 3) == '1'
      if (!magicAt(0) || !magicAt(n - 4)) return None
      val fl = (b(n - 8) & 0xff) | (b(n - 7) & 0xff) << 8 |
        (b(n - 6) & 0xff) << 16 | (b(n - 5) & 0xff) << 24
      if (fl <= 0 || fl > n - 12) return None
      val tc = new TC(b, n - 8 - fl, n - 8)
      var version = -1
      var numRows = -1L
      var createdBy = ""
      var schema = Seq.empty[SchemaElem]
      var rowGroups = Seq.empty[RowGroupMeta]
      struct(tc, 0) { (id, tpe) =>
        id match {
          case 1 => version = i32(tc, tpe); true
          case 2 =>
            if (tpe != 9) damage()
            val (cnt, et) = listHeader(tc)
            if (et != 12) damage()
            schema = Seq.fill(cnt)(parseSchemaElem(tc)); true
          case 3 => numRows = i64(tc, tpe); true
          case 4 =>
            if (tpe != 9) damage()
            val (cnt, et) = listHeader(tc)
            if (et != 12) damage()
            rowGroups = Seq.fill(cnt)(parseRowGroup(tc)); true
          case 6 => if (tpe != 8) damage(); createdBy = tc.str(); true
          case _ => false
        }
      }
      // required fields of the IDL must all have arrived
      if (version < 0 || numRows < 0 || schema.isEmpty) return None
      // the thrift walk must land exactly at the trailer
      if (tc.pos != n - 8) return None
      val fm = FileMeta(version, schema, numRows, rowGroups, createdBy, fl)
      fm.leafLevels // child-count tiling must be valid (damages if not)
      Some(fm)
    } catch { case _: Damage => None }
  }

  private def parseSchemaElem(tc: TC): SchemaElem = {
    var typ = -1; var rep = -1; var name = ""; var children = 0
    struct(tc, 1) { (id, tpe) =>
      id match {
        case 1 => typ = i32(tc, tpe); true
        case 3 => rep = i32(tc, tpe); true
        case 4 => if (tpe != 8) damage(); name = tc.str(); true
        case 5 => children = i32(tc, tpe); true
        case _ => false
      }
    }
    if (name.isEmpty || children < 0) damage()
    SchemaElem(typ, rep, name, children)
  }

  private def parseRowGroup(tc: TC): RowGroupMeta = {
    var cols = Seq.empty[ColMeta]
    var totalBytes = -1L; var numRows = -1L
    struct(tc, 1) { (id, tpe) =>
      id match {
        case 1 =>
          if (tpe != 9) damage()
          val (cnt, et) = listHeader(tc)
          if (et != 12) damage()
          cols = Seq.fill(cnt)(parseColumnChunk(tc)); true
        case 2 => totalBytes = i64(tc, tpe); true
        case 3 => numRows = i64(tc, tpe); true
        case _ => false
      }
    }
    if (cols.isEmpty || numRows < 0 || totalBytes < 0) damage()
    RowGroupMeta(cols, totalBytes, numRows)
  }

  private def parseColumnChunk(tc: TC): ColMeta = {
    var meta: ColMeta = null
    struct(tc, 2) { (id, tpe) =>
      id match {
        case 3 =>
          if (tpe != 12) damage()
          meta = parseColumnMeta(tc); true
        case _ => false
      }
    }
    if (meta == null) damage()
    meta
  }

  private def parseColumnMeta(tc: TC): ColMeta = {
    var typ = -1; var encodings = Seq.empty[Int]; var path = ""
    var codec = -1; var numValues = -1L
    var totUnc = -1L; var totComp = -1L
    var dataOff = -1L; var dictOff = -1L
    struct(tc, 3) { (id, tpe) =>
      id match {
        case 1 => typ = i32(tc, tpe); true
        case 2 => encodings = i32List(tc, tpe); true
        case 3 =>
          if (tpe != 9) damage()
          val (n, et) = listHeader(tc)
          if (et != 8) damage()
          path = Seq.fill(n)(tc.str()).mkString("."); true
        case 4 => codec = i32(tc, tpe); true
        case 5 => numValues = i64(tc, tpe); true
        case 6 => totUnc = i64(tc, tpe); true
        case 7 => totComp = i64(tc, tpe); true
        case 9 => dataOff = i64(tc, tpe); true
        case 11 => dictOff = i64(tc, tpe); true
        case _ => false
      }
    }
    if (typ < 0 || path.isEmpty || codec < 0 || numValues < 0 ||
      totUnc < 0 || totComp < 0 || dataOff < 0) damage()
    ColMeta(typ, encodings, path, codec, numValues, totUnc, totComp,
      dataOff, dictOff)
  }

  // ---- page walk + PLAIN decode ----------------------------------------

  private case class PageHead(pageType: Int, uncompressed: Int,
                              compressed: Int, numValues: Int,
                              encoding: Int, headerEnd: Int)

  private def parsePageHeader(b: Array[Byte], off: Int): PageHead = {
    if (off < 0 || off >= b.length) damage()
    val tc = new TC(b, off, b.length)
    var pt = -1; var unc = -1; var comp = -1
    var nv = -1; var enc = -1
    struct(tc, 0) { (id, tpe) =>
      id match {
        case 1 => pt = i32(tc, tpe); true
        case 2 => unc = i32(tc, tpe); true
        case 3 => comp = i32(tc, tpe); true
        case 5 => // DataPageHeader
          if (tpe != 12) damage()
          struct(tc, 1) { (did, dtpe) =>
            did match {
              case 1 => nv = i32(tc, dtpe); true
              case 2 => enc = i32(tc, dtpe); true
              case _ => false
            }
          }
          true
        case _ => false
      }
    }
    if (pt < 0 || unc < 0 || comp < 0) damage()
    PageHead(pt, unc, comp, nv, enc, tc.pos)
  }

  /** Decoded totals of one PLAIN column chunk: the proof the footer's
    * offsets point at real pages. Sums are type-routed: INT64 →
    * long_sum, DOUBLE → double_sum, BYTE_ARRAY → byte lengths.
    */
  case class ChunkValues(numValues: Long, longSum: Long, doubleSum: Double,
                         binLenSum: Long, nPages: Int)

  /** Decode every v1 data page of a FLAT column chunk written with
    * PLAIN encoding and none/gzip codec. `maxDef` is 0 for a REQUIRED
    * leaf (no level bytes in the page) and 1 for an OPTIONAL one
    * (RLE/bit-packed-hybrid definition levels precede the values) —
    * derive it from the footer schema's leaf repetition. None on
    * dictionary pages, nested columns, other encodings/codecs, or
    * malformation.
    */
  def decodeChunk(b: Array[Byte], col: ColMeta,
                  maxDef: Int = 0): Option[ChunkValues] = {
    try {
      if (col.physType != PhysInt64 && col.physType != PhysDouble &&
        col.physType != PhysByteArray) return None
      if (col.codec != CodecNone && col.codec != CodecGzip) return None
      if (col.dictPageOffset >= 0) return None // dictionary: not PLAIN
      if (col.dataPageOffset > Int.MaxValue) return None
      if (maxDef < 0 || maxDef > 1) return None // flat columns only
      var pos = col.dataPageOffset.toInt
      var values = 0L
      var longSum = 0L; var doubleSum = 0.0; var binLen = 0L
      var pages = 0
      while (values < col.numValues) {
        val h = parsePageHeader(b, pos)
        if (h.pageType != 0 || h.encoding != EncPlain) return None
        if (h.numValues <= 0 || values + h.numValues > col.numValues)
          return None
        if (h.compressed < 0 || h.headerEnd + h.compressed > b.length)
          return None
        if (h.uncompressed < 0 || h.uncompressed > (1 << 26)) return None
        val raw: Array[Byte] =
          if (col.codec == CodecNone) {
            if (h.compressed != h.uncompressed) return None
            java.util.Arrays.copyOfRange(b, h.headerEnd,
              h.headerEnd + h.compressed)
          } else gunzipExact(b, h.headerEnd, h.compressed, h.uncompressed)
            .getOrElse(return None)
        // num_values counts nulls too: definition level == maxDef marks
        // the positions that carry a stored value
        val (levels, valuesStart) =
          if (maxDef == 0) (null: Array[Int], 0)
          else readDefLevels(raw, h.numValues)
        var p = valuesStart
        var i = 0
        while (i < h.numValues) {
          val present = levels == null || levels(i) == 1
          if (present) col.physType match {
            case PhysInt64 | PhysDouble =>
              if (p + 8 > raw.length) return None
              var v = 0L
              var k = 7
              while (k >= 0) { v = (v << 8) | (raw(p + k) & 0xffL); k -= 1 }
              if (col.physType == PhysInt64) longSum += v
              else doubleSum += java.lang.Double.longBitsToDouble(v)
              p += 8
            case PhysByteArray =>
              if (p + 4 > raw.length) return None
              val len = (raw(p) & 0xff) | (raw(p + 1) & 0xff) << 8 |
                (raw(p + 2) & 0xff) << 16 | (raw(p + 3) & 0xff) << 24
              if (len < 0 || p + 4 + len > raw.length) return None
              binLen += len
              p += 4 + len
          }
          i += 1
        }
        if (p != raw.length) return None // PLAIN pages are exact
        values += h.numValues
        pages += 1
        pos = h.headerEnd + h.compressed
      }
      Some(ChunkValues(values, longSum, doubleSum, binLen, pages))
    } catch { case _: Damage => None }
  }

  /** Read the v1-page definition-level block (bit width 1): a LE32
    * byte-length prefix, then RLE/bit-packed hybrid runs. Returns the
    * level per value slot and the offset where values start.
    */
  private def readDefLevels(raw: Array[Byte],
                            numValues: Int): (Array[Int], Int) = {
    if (raw.length < 4) damage()
    val len = (raw(0) & 0xff) | (raw(1) & 0xff) << 8 |
      (raw(2) & 0xff) << 16 | (raw(3) & 0xff) << 24
    if (len < 0 || 4 + len > raw.length) damage()
    // numValues is header-controlled (i32): bound it against the page
    // itself (>= 1 bit per value) BEFORE allocating, or a forged header
    // forces a multi-GB array
    if (numValues < 0 || numValues.toLong > 8L * raw.length) damage()
    val end = 4 + len
    val levels = new Array[Int](numValues)
    var li = 0
    var p = 4
    while (li < numValues) {
      if (p >= end) damage()
      // hybrid run header: LSB 0 = RLE run, LSB 1 = bit-packed groups
      var h = 0L; var shift = 0; var cont = true
      while (cont) {
        if (p >= end || shift > 35) damage()
        val x = raw(p) & 0xff; p += 1
        h |= (x & 0x7fL) << shift; shift += 7
        cont = (x & 0x80) != 0
      }
      if ((h & 1L) == 0) {
        if (p >= end) damage()
        val v = raw(p) & 0xff; p += 1 // bit width 1 -> one value byte
        if (v > 1) damage()
        var i = (h >>> 1).toInt
        while (i > 0 && li < numValues) { levels(li) = v; li += 1; i -= 1 }
      } else {
        var g = (h >>> 1).toInt
        while (g > 0) {
          if (p >= end) damage()
          val byte = raw(p) & 0xff; p += 1
          var bit = 0
          while (bit < 8) {
            if (li < numValues) { levels(li) = (byte >> bit) & 1; li += 1 }
            bit += 1
          }
          g -= 1
        }
      }
    }
    (levels, end)
  }

  /** Inflate one RFC 1952 gzip stream to EXACTLY `want` bytes. The
    * GZIPInputStream CONSTRUCTOR already reads the 10-byte header and
    * throws on forged magic or truncation, so it must sit inside the
    * try with the read loop — otherwise a corrupted first page byte
    * crashes the task instead of damaging to None.
    */
  private def gunzipExact(b: Array[Byte], off: Int, len: Int,
                          want: Int): Option[Array[Byte]] = {
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b, off, len))
      val out = new Array[Byte](want)
      var got = 0
      var n = 0
      while (got < want && n >= 0) {
        n = in.read(out, got, want - got)
        if (n > 0) got += n
      }
      // exactly `want` bytes, and the stream must END there
      if (got == want && in.read() == -1) Some(out) else None
    } catch {
      case _: java.io.IOException => None
    } finally if (in != null) in.close()
  }
}
