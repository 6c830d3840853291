package graft.sources

import org.apache.spark.sql.{Dataset, Encoders}

/** POSIX ustar (IEEE 1003.1) archive walk — the OTHER container format
  * crawled corpora arrive in (source tarballs, dataset dumps, model
  * checkpoints ship as .tar / .tar.gz). Unlike ZIP's tail-first
  * central directory, tar has NO index: the only way to reach entry
  * K+1 is to parse entry K's 512-byte header, read its size field
  * (ASCII OCTAL — the format predates binary integers in headers), and
  * stride past ceil(size/512) data blocks — the WARC/MP3 forward-walk
  * shape with a checksum per header.
  *
  * Header layout (offsets into the 512-byte block): name[0,100),
  * mode[100,8), uid[108,8), gid[116,8), size[124,12) octal,
  * mtime[136,12) octal, chksum[148,8) octal, typeflag[156],
  * linkname[157,100), magic[257,6) = "ustar", prefix[345,155). The
  * checksum is the byte sum of the header with the chksum field
  * treated as 8 spaces — verified here for every entry (a corrupted
  * header otherwise mis-strides and silently truncates the walk).
  * End of archive = two consecutive zero blocks.
  *
  * Scope: ustar, the old GNU variant (magic "ustar  \0"), PAX
  * (POSIX.1-2001) extended headers, and GNU long names. PAX `x`
  * (per-file) and `g` (global) entries carry `"%d keyword=value\n"`
  * records whose length field counts ITSELF — the walk parses them and
  * applies `path`/`size`/`mtime`/`linkpath` overrides to the entries
  * they govern instead of surfacing the metadata blocks as data rows
  * (CPython's tarfile has DEFAULTED to PAX since 3.8, so HF-style
  * dataset tarballs with >100-char paths carry these on every long
  * entry). A PAX `size` override also drives the STRIDE — that is how
  * >8 GiB members (past the 12-digit octal field) stay walkable. GNU
  * `L`/`K` entries override the next entry's name/linkname the
  * pre-POSIX way. One blob per task, zero shuffles ([[Warc.records]] /
  * [[Zip.entries]] posture). Malformation — bad checksum, non-octal
  * size, malformed PAX record, truncated data, missing terminator —
  * yields Nil (byte-walk totality law).
  */
object Tar {

  /** One input blob: a tar file's raw bytes. */
  case class TarBlob(blob_id: Long, content: Array[Byte])

  /** One archive member. `data_offset` points at the member's first
    * payload byte so consumers can range-read it lazily.
    */
  case class TarEntry(blob_id: Long, entry_name: String, size: Long,
                      type_flag: String, mtime: Long, data_offset: Long)

  /** Parse an ASCII-octal field (NUL/space padded); -1 if malformed. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    // skip leading spaces
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return -1L
      v = v * 8 + (c - '0')
      any = true
      i += 1
    }
    if (any) v else -1L
  }

  /** Parse a PAX extended-header payload: `"%d keyword=value\n"`
    * records, the length prefix counting itself (POSIX.1-2001 §pax).
    * None on any malformed record — a metadata block we cannot read
    * governs entries we would then mis-name or mis-stride.
    */
  private def paxRecords(p: Array[Byte]): Option[Map[String, String]] = {
    val m = Map.newBuilder[String, String]
    var i = 0
    while (i < p.length) {
      var j = i
      while (j < p.length && p(j) != ' ') j += 1
      if (j >= p.length || j == i || j - i > 9) return None
      var len = 0
      var k = i
      while (k < j) {
        val c = p(k)
        if (c < '0' || c > '9') return None
        len = len * 10 + (c - '0')
        k += 1
      }
      if (len <= 0 || i + len > p.length || p(i + len - 1) != '\n') return None
      val rec = new String(p, j + 1, i + len - j - 2,
        java.nio.charset.StandardCharsets.UTF_8)
      val eq = rec.indexOf('=')
      if (eq < 0) return None
      m += rec.substring(0, eq) -> rec.substring(eq + 1)
      i += len
    }
    Some(m.result())
  }

  /** Walk one blob. Nil on any malformation (totality law). */
  def parse(blobId: Long, b: Array[Byte]): Seq[TarEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var pos = 0
    // metadata-entry state: PAX per-file ('x') and global ('g') records,
    // GNU long name ('L'). Applied to the next data entry, then cleared.
    var pend: Map[String, String] = Map.empty
    var global: Map[String, String] = Map.empty
    var gnuName: Option[String] = None
    def paxLong(v: String): Long = {
      // PAX numeric values may carry a fraction (tarfile writes float
      // mtimes); the integral part is what the header octal would hold
      val dot = v.indexOf('.')
      val intPart = if (dot < 0) v else v.substring(0, dot)
      try intPart.toLong catch { case _: NumberFormatException => -1L }
    }
    def zeroBlock(off: Int): Boolean = {
      if (off + 512 > b.length) return false
      var i = off
      while (i < off + 512 && b(i) == 0) i += 1
      i == off + 512
    }
    while (true) {
      if (pos + 512 > b.length) return Nil // ran out before the terminator
      if (zeroBlock(pos)) {
        // end of archive: a second zero block must follow (readers
        // tolerate extra padding after it)
        return if (zeroBlock(pos + 512)) out.toSeq else Nil
      }
      // ---- header integrity ------------------------------------------
      val magic = new String(b, pos + 257, 5,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (magic != "ustar") return Nil
      val stated = octal(b, pos + 148, 8)
      if (stated < 0) return Nil
      var sum = 0L
      var i = pos
      while (i < pos + 512) {
        sum += (if (i >= pos + 148 && i < pos + 156) ' '.toInt
                else b(i) & 0xff)
        i += 1
      }
      if (sum != stated) return Nil // corrupted header: stop, report none
      // ---- fields ------------------------------------------------------
      val size = octal(b, pos + 124, 12)
      val mtime = octal(b, pos + 136, 12)
      if (size < 0 || mtime < 0) return Nil
      var nameLen = 0
      while (nameLen < 100 && b(pos + nameLen) != 0) nameLen += 1
      var name = new String(b, pos, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // ustar long names carry the directory part in prefix[345,155)
      var pfxLen = 0
      while (pfxLen < 155 && b(pos + 345 + pfxLen) != 0) pfxLen += 1
      if (pfxLen > 0)
        name = new String(b, pos + 345, pfxLen,
          java.nio.charset.StandardCharsets.UTF_8) + "/" + name
      val tf = (b(pos + 156) & 0xff).toChar
      val typeFlag = if (tf == 0) "0" else tf.toString
      val dataOff = pos + 512
      // A PAX size override REPLACES the header octal for both the
      // emitted size and the stride (that is how >8 GiB members, past
      // the 12-digit field, stay walkable); metadata entries always
      // stride by their own header size.
      val isMeta = tf == 'x' || tf == 'g' || tf == 'L' || tf == 'K'
      val effSize =
        if (isMeta) size
        else pend.get("size").orElse(global.get("size")) match {
          case Some(v) => val s = paxLong(v); if (s < 0) return Nil else s
          case None => size
        }
      // Stride arithmetic in Long: the 12-digit octal size field encodes
      // values up to 8^11-1 (~8 GiB), so dataBlocks*512 in Int wraps — a
      // forged size near 4 GiB would stall pos (infinite loop) or march
      // it negative. Untrusted crawl tarballs make this reachable (the
      // checksum is trivially forgeable), so the bound check must not
      // itself overflow.
      val next = dataOff.toLong + ((effSize + 511L) / 512L) * 512L
      if (next > b.length) return Nil // truncated (or absurd size)
      tf match {
        case 'x' | 'g' => // PAX metadata: parse records, surface nothing
          paxRecords(java.util.Arrays.copyOfRange(b, dataOff,
            dataOff + size.toInt)) match {
            case None => return Nil // unreadable metadata governs entries
            case Some(recs) =>
              if (tf == 'x') pend ++= recs else global ++= recs
          }
        case 'L' => // GNU long name: payload is the next entry's name
          var n = 0
          val cap = size.toInt
          while (n < cap && b(dataOff + n) != 0) n += 1
          gnuName = Some(new String(b, dataOff, n,
            java.nio.charset.StandardCharsets.UTF_8))
        case 'K' => () // GNU long linkname: consumed, not modeled
        case _ =>
          val effName = pend.get("path").orElse(gnuName)
            .orElse(global.get("path")).getOrElse(name)
          val effMtime =
            pend.get("mtime").orElse(global.get("mtime")) match {
              case Some(v) => val m = paxLong(v); if (m < 0) return Nil else m
              case None => mtime
            }
          out += TarEntry(blobId, effName, effSize, typeFlag, effMtime,
            dataOff.toLong)
          pend = Map.empty
          gnuName = None
      }
      pos = next.toInt
    }
    out.toSeq // unreachable
  }

  /** Explode tar blobs into entries on the scan tasks — zero shuffles,
    * one archive per row.
    */
  def entries(blobs: Dataset[TarBlob]): Dataset[TarEntry] = {
    implicit val enc = Encoders.product[TarEntry]
    blobs.mapPartitions(_.flatMap(t => parse(t.blob_id, t.content)))
  }

  /** Minimal tar WRITER (the archival-sink twin of [[parse]]): plain
    * files, correct octal fields and header checksums, 512-padded
    * payloads, double-zero-block terminator. Names over 100 bytes are
    * written the PAX way (the CPython-tarfile-default posture an
    * HF-style dataset tarball ships in): an `x` extended header whose
    * single `path=` record carries the full name — with the
    * self-counting length prefix — followed by the entry header with
    * the name truncated into the plain field. Read side is pinned
    * against CPython tarfile's output (TarSpec + fixtures/golden.tar,
    * golden_pax.tar, golden_gnu.tar); the writer round-trips through
    * [[parse]] and its headers follow the identical field layout.
    */
  def write(entries: Seq[(String, Array[Byte], Long)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def octalField(v: Long, len: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      require(s.length < len, s"octal field overflow: $v into $len")
      val b = new Array[Byte](len)
      val padded = ("0" * (len - 1 - s.length)) + s
      var i = 0
      while (i < len - 1) { b(i) = padded.charAt(i).toByte; i += 1 }
      b(len - 1) = 0
      b
    }
    def header(nameB: Array[Byte], size: Long, mtime: Long,
               typeflag: Char): Unit = {
      require(nameB.length <= 100, "plain name field overflow")
      require(mtime >= 0, "mtime must be non-negative")
      val h = new Array[Byte](512)
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      System.arraycopy(octalField(420 /* 0644 */, 8), 0, h, 100, 8)
      System.arraycopy(octalField(0, 8), 0, h, 108, 8) // uid
      System.arraycopy(octalField(0, 8), 0, h, 116, 8) // gid
      System.arraycopy(octalField(size, 12), 0, h, 124, 12)
      System.arraycopy(octalField(mtime, 12), 0, h, 136, 12)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
      h(156) = typeflag.toByte
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
      h(262) = 0; h(263) = '0'; h(264) = '0' // ustar\0 + version "00"
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      // chksum: six octal digits, NUL, space (the layout CPython's
      // tarfile and GNU tar both emit; header sums cap at 512·255 < 8^6)
      val ck = octalField(sum, 7)
      System.arraycopy(ck, 0, h, 148, 7)
      h(155) = ' '
      out.write(h)
    }
    def payload(data: Array[Byte]): Unit = {
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    entries.foreach { case (name, data, mtime) =>
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (nameB.length > 100) {
        // "%d path=<name>\n" — the length prefix counts itself, so the
        // digit count must be found by fixpoint (112→3 digits, etc.)
        val base = 7 + nameB.length // ' ' + "path=" + name + '\n'
        var digits = 1
        while (String.valueOf(base + digits).length != digits) digits += 1
        val rec = base + digits
        val recB = (rec.toString + " path=").getBytes("US-ASCII") ++
          nameB ++ Array('\n'.toByte)
        require(recB.length == rec, "pax record arithmetic")
        header("PaxHeaders/x".getBytes("US-ASCII"), rec.toLong, mtime, 'x')
        payload(recB)
        header(nameB.take(100), data.length.toLong, mtime, '0')
      } else header(nameB, data.length.toLong, mtime, '0')
      payload(data)
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }
}
