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
  * Scope: single-disk archives, no ZIP64 (entries and offsets < 4 GB —
  * ZIP64's 0xFFFFFFFF escapes would extend the same walk); metadata
  * only (no inflate here — entry payload decode belongs to the format
  * the entry contains). Malformed input — no EOCD magic in the tail
  * window, out-of-range directory span, truncated header, entry whose
  * local-header offset does not hold a local-header magic — yields an
  * empty result (byte-walk totality law: never a partial inventory
  * presented as complete).
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
    val nEntries = le16(eocd + 10)
    val cdSize = le32(eocd + 12)
    val cdOffset = le32(eocd + 16)
    if (nEntries < 0 || cdSize < 0 || cdOffset < 0 ||
      cdOffset + cdSize > eocd) return Nil
    // ---- central-directory walk --------------------------------------
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var pos = cdOffset.toInt
    var k = 0
    while (k < nEntries) {
      if (le32(pos) != CdhMagic || pos + 46 > b.length) return Nil
      val method = le16(pos + 10)
      val crc = le32(pos + 16)
      val compSize = le32(pos + 20)
      val uncompSize = le32(pos + 24)
      val nameLen = le16(pos + 28)
      val extraLen = le16(pos + 30)
      val commentLen = le16(pos + 32)
      val lfhOff = le32(pos + 42)
      if (nameLen < 0 || extraLen < 0 || commentLen < 0 ||
        pos + 46 + nameLen > b.length) return Nil
      // pointer-chase proof: the named local-header offset must hold a
      // local-header magic (a directory pointing into garbage is not an
      // inventory)
      if (lfhOff < 0 || le32(lfhOff.toInt) != LfhMagic) return Nil
      val name = new String(b, pos + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      out += ZipEntry(blobId, name, method, crc, compSize, uncompSize, lfhOff)
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    // the walk must land exactly at the directory's stated end
    if (pos != (cdOffset + cdSize).toInt) return Nil
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
