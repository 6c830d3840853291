package graft.sources

import org.apache.spark.sql.{Dataset, Encoders}

/** ZIP (PKWARE APPNOTE) central-directory walk — the container format a
  * crawl actually ships documents in: docx, epub, jar/apk, odt are all
  * ZIPs, and a 100 TB archive sweep reads each file's END (EOCD +
  * central directory) to inventory entries WITHOUT touching the
  * payloads. That tail-first access pattern is the whole point of the
  * format: the End Of Central Directory record sits at the end (behind
  * an up-to-64 KB comment), names the central directory's offset and
  * size, and each central-directory header carries the entry's name,
  * compression method, sizes, CRC-32, and local-header offset — a
  * pointer chase from the back, the mirror image of the MP4/TIFF
  * forward walks.
  *
  * Mirrors the reference's container-ingestion posture (cf.
  * `/root/reference/pdf_to_xlsx.py:126` — the reference's xlsx output
  * IS a zip, opened via openpyxl; this engine walks the directory
  * itself on the scan task, zero shuffles).
  *
  * Scope: single-disk archives, WITH ZIP64 (APPNOTE §4.4.1 / §4.5.3):
  * when the EOCD's 16/32-bit fields carry their 0xFFFF / 0xFFFFFFFF
  * escape values, the walk follows the EOCD64 locator (0x07064b50,
  * the 20 bytes preceding the EOCD) to the EOCD64 record (0x06064b50)
  * and takes entry count / directory size / offset from its 64-bit
  * fields; per-entry, escaped central-header size/offset fields
  * resolve through the 0x0001 "ZIP64 extended information" extra
  * field, whose 8-byte values appear IN ESCAPE ORDER (uncompressed,
  * compressed, local-header offset, disk) and only for the fields
  * actually escaped. A >4 GB archive and a >65,535-entry archive both
  * walk with the same code — the escapes are exercised by small blobs
  * in ZipSpec/q220 because the mechanism, not the payload size, is
  * what needs proving. Metadata only (no inflate here — entry payload
  * decode belongs to the format the entry contains). Malformed input —
  * no EOCD magic in the tail window, out-of-range directory span,
  * truncated header, an escape with no backing ZIP64 field, entry
  * whose local-header offset does not hold a local-header magic —
  * yields an empty result (byte-walk totality law: never a partial
  * inventory presented as complete).
  */
object Zip {

  /** One input blob: a ZIP file's raw bytes. */
  case class ZipBlob(blob_id: Long, content: Array[Byte])

  /** One central-directory entry (metadata only — payloads are sliced
    * lazily by whoever consumes the entry, via `lfh_offset`).
    */
  case class ZipEntry(blob_id: Long, entry_name: String, method: Int,
                      crc32: Long, comp_size: Long, uncomp_size: Long,
                      lfh_offset: Long)

  private val EocdMagic = 0x06054b50L
  private val Eocd64Magic = 0x06064b50L
  private val Eocd64LocMagic = 0x07064b50L
  private val CdhMagic = 0x02014b50L
  private val LfhMagic = 0x04034b50L

  /** Walk one blob's central directory. Returns all entries, or Nil on
    * any malformation (totality law — see class doc).
    */
  def parseCentralDirectory(blobId: Long, b: Array[Byte]): Seq[ZipEntry] = {
    def u8(i: Int): Int = if (i >= 0 && i < b.length) b(i) & 0xff else -1
    def le16(i: Int): Int = {
      val lo = u8(i); val hi = u8(i + 1)
      if (lo < 0 || hi < 0) -1 else lo | (hi << 8)
    }
    def le32(i: Int): Long = {
      val a = u8(i); val c = u8(i + 1); val d = u8(i + 2); val e = u8(i + 3)
      if (a < 0 || c < 0 || d < 0 || e < 0) -1L
      else (a.toLong) | (c.toLong << 8) | (d.toLong << 16) | (e.toLong << 24)
    }
    // ---- EOCD: scan BACKWARD from the end through the comment window
    // (spec: comment ≤ 65535 bytes, EOCD is the last record) ----------
    if (b.length < 22) return Nil
    var eocd = -1
    var i = b.length - 22
    val floor = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (le32(i) == EocdMagic &&
        // the candidate is real only if its comment length reaches the
        // true end of file — guards against the magic appearing inside
        // a comment or payload
        i + 22 + le16(i + 20) == b.length) eocd = i
      i -= 1
    }
    if (eocd < 0) return Nil
    def le64(i: Int): Long = {
      // 8-byte LE; -1 on truncation. Values ≥ 2^63 cannot occur in a
      // blob this walk can index anyway (arrays are Int-addressed).
      val lo = le32(i); val hi = le32(i + 4)
      if (lo < 0 || hi < 0 || hi > Int.MaxValue) -1L else lo | (hi << 32)
    }
    var nEntries = le16(eocd + 10).toLong
    var cdSize = le32(eocd + 12)
    var cdOffset = le32(eocd + 16)
    // ---- ZIP64: escaped EOCD fields resolve through locator + EOCD64.
    // The escape values are SENTINELS, not data — an archive whose true
    // count/size/offset hits them must write the ZIP64 records, so a
    // missing locator behind an escape is malformation, not a fallback.
    if (nEntries == 0xffffL || cdSize == 0xffffffffL ||
      cdOffset == 0xffffffffL) {
      val loc = eocd - 20
      if (loc < 0 || le32(loc) != Eocd64LocMagic) return Nil
      if (le32(loc + 4) != 0L || le32(loc + 16) != 1L) return Nil // single disk
      val e64 = le64(loc + 8)
      if (e64 < 0 || e64 + 56 > loc || le32(e64.toInt) != Eocd64Magic)
        return Nil
      val p = e64.toInt
      if (le32(p + 16) != 0L || le32(p + 20) != 0L) return Nil // single disk
      val total = le64(p + 32)
      if (le64(p + 24) != total) return Nil // entries-on-disk ≡ total
      nEntries = total
      cdSize = le64(p + 40)
      cdOffset = le64(p + 48)
      if (nEntries < 0 || cdSize < 0 || cdOffset < 0 ||
        cdOffset + cdSize > e64) return Nil
    } else if (nEntries < 0 || cdSize < 0 || cdOffset < 0 ||
      cdOffset + cdSize > eocd) return Nil
    // ---- central-directory walk --------------------------------------
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var pos = cdOffset.toInt
    var k = 0L
    while (k < nEntries) {
      if (le32(pos) != CdhMagic || pos + 46 > b.length) return Nil
      val method = le16(pos + 10)
      val crc = le32(pos + 16)
      var compSize = le32(pos + 20)
      var uncompSize = le32(pos + 24)
      val nameLen = le16(pos + 28)
      val extraLen = le16(pos + 30)
      val commentLen = le16(pos + 32)
      val diskStart = le16(pos + 34)
      var lfhOff = le32(pos + 42)
      if (nameLen < 0 || extraLen < 0 || commentLen < 0 ||
        pos + 46 + nameLen + extraLen > b.length) return Nil
      // ZIP64 per-entry escapes → the 0x0001 extra field. Its 8-byte
      // values appear in escape order and ONLY for escaped fields.
      if (uncompSize == 0xffffffffL || compSize == 0xffffffffL ||
        lfhOff == 0xffffffffL || diskStart == 0xffff) {
        var p = pos + 46 + nameLen
        val end = p + extraLen
        var found = false
        while (!found && p + 4 <= end) {
          val id = le16(p)
          val sz = le16(p + 2)
          if (id < 0 || sz < 0 || p + 4 + sz > end) return Nil
          if (id == 0x0001) {
            var q = p + 4
            val qEnd = p + 4 + sz
            def take64(): Long = {
              if (q + 8 > qEnd) -1L else { val v = le64(q); q += 8; v }
            }
            if (uncompSize == 0xffffffffL) {
              uncompSize = take64(); if (uncompSize < 0) return Nil
            }
            if (compSize == 0xffffffffL) {
              compSize = take64(); if (compSize < 0) return Nil
            }
            if (lfhOff == 0xffffffffL) {
              lfhOff = take64(); if (lfhOff < 0) return Nil
            }
            if (diskStart == 0xffff) {
              if (q + 4 > qEnd || le32(q) != 0L) return Nil // single disk
            }
            found = true
          }
          p += 4 + sz
        }
        if (!found) return Nil // an escape with no backing ZIP64 field
      }
      // pointer-chase proof: the named local-header offset must hold a
      // local-header magic (a directory pointing into garbage is not an
      // inventory)
      if (lfhOff < 0 || lfhOff > b.length - 4L ||
        le32(lfhOff.toInt) != LfhMagic) return Nil
      val name = new String(b, pos + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      out += ZipEntry(blobId, name, method, crc, compSize, uncompSize, lfhOff)
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    // the walk must land exactly at the directory's stated end
    if (pos.toLong != cdOffset + cdSize) return Nil
    out.toSeq
  }

  /** Explode ZIP blobs into central-directory entries on the scan tasks
    * — zero shuffles, one archive per row (the [[Warc.records]] shape).
    */
  def entries(blobs: Dataset[ZipBlob]): Dataset[ZipEntry] = {
    implicit val enc = Encoders.product[ZipEntry]
    blobs.mapPartitions(_.flatMap(z => parseCentralDirectory(z.blob_id, z.content)))
  }
}
