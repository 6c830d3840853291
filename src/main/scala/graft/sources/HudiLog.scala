package graft.sources

/** Hudi LOG FILE walk (hudi.apache.org/tech-specs, "Log File
  * Format"): merge-on-read tables append updates and deletes to
  * `.{fileId}_{baseInstant}.log.{version}_{token}` files as a
  * sequence of framed blocks; the read view merges blocks whose
  * instants belong to COMPLETED deltacommits over the base file,
  * in instant order, last-wins per record key.
  *
  * Block frame (this engine's write/read contract, following the
  * spec's v1 layout): magic `#HUDI#`; BE64 blocksize = bytes from
  * the version field through the trailing total-length field; BE32
  * log format version (1); BE32 block type (0 command, 1 delete,
  * 2 corrupt, 3 avro data); header map (BE32 entry count, then per
  * entry BE32 key / BE32 length / UTF-8 value — keys 1 INSTANT_TIME,
  * 3 SCHEMA); BE64 content length; content; footer map (same
  * encoding); BE64 total block length INCLUDING the magic (the
  * spec's reverse-traversal pointer). Avro data content: BE32
  * content version, BE32 record count, then BE32 length + one bare
  * binary Avro datum per record under the header SCHEMA
  * ([[AvroGeneric.parseDatum]]). Delete content: BE32 content
  * version, BE32 key count, then BE32 length + UTF-8 record key per
  * entry — the spec's DeleteRecord array reduced to its keys, the
  * only field the merge consumes.
  *
  * Totality law: bad magic, framing fields that disagree, a record
  * that desyncs or leaves leftover bytes, an unparseable header
  * schema, or trailing garbage → None — never a throw, never
  * partial rows.
  */
object HudiLog {

  /** One decoded log block. `records` non-empty only for avro data
    * blocks, `deleteKeys` only for delete blocks.
    */
  final case class Block(blockType: Int, instant: String,
                         records: Vector[AvroGeneric.V],
                         deleteKeys: Vector[String],
                         /** Rollback COMMAND blocks name the instant
                           * they cancel here; empty otherwise.
                           */
                         target: String = "")

  val TypeCommand = 0
  val TypeDelete = 1
  val TypeCorrupt = 2
  val TypeAvroData = 3

  val HdrInstantTime = 1
  val HdrTargetInstant = 2
  val HdrSchema = 3

  private val Magic = "#HUDI#".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val MaxBlocks = 1 << 12
  private val MaxEntries = 1 << 20

  private final class Damage
    extends RuntimeException(null, null, false, false)
  private def damage(): Nothing = throw new Damage

  private def be32(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 4 > b.length) damage()
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
  }

  private def be64(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 8 > b.length) damage()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    v
  }

  /** BE32-count map of BE32 key -> length-prefixed UTF-8 value. */
  private def readMap(b: Array[Byte],
                      p0: Int): (Map[Int, String], Int) = {
    val n = be32(b, p0)
    if (n < 0 || n > 64) damage()
    var p = p0 + 4
    var m = Map.empty[Int, String]
    var i = 0
    while (i < n) {
      val k = be32(b, p)
      val len = be32(b, p + 4)
      if (len < 0 || p + 8 + len > b.length) damage()
      m += (k -> new String(b, p + 8, len, Utf8))
      p += 8 + len
      i += 1
    }
    (m, p)
  }

  /** Walk a complete log file into its blocks, in file order. */
  def parse(b: Array[Byte]): Option[Vector[Block]] = {
    try {
      val out = Vector.newBuilder[Block]
      var pos = 0
      var nBlocks = 0
      while (pos < b.length) {
        nBlocks += 1
        if (nBlocks > MaxBlocks) return None
        val blockStart = pos
        if (pos + 6 > b.length) return None
        var i = 0
        while (i < 6) {
          if (b(pos + i) != Magic(i)) return None
          i += 1
        }
        pos += 6
        val blockSize = be64(b, pos)
        pos += 8
        // blocksize covers version..totalLen inclusive; the empty
        // block is 4+4+4+8+4+8 = 32 bytes
        if (blockSize < 32 || blockSize > b.length - pos) return None
        val blockEnd = pos + blockSize.toInt
        val version = be32(b, pos)
        if (version != 1) return None
        val blockType = be32(b, pos + 4)
        pos += 8
        val (header, afterHdr) = readMap(b, pos)
        pos = afterHdr
        val contentLen = be64(b, pos)
        pos += 8
        if (contentLen < 0 || contentLen > blockEnd - pos) return None
        val contentStart = pos
        val contentEnd = pos + contentLen.toInt
        pos = contentEnd
        val (_, afterFooter) = readMap(b, pos)
        pos = afterFooter
        if (pos + 8 != blockEnd) return None
        val totalLen = be64(b, pos)
        pos += 8
        if (totalLen != (blockEnd - blockStart).toLong) return None
        val instant = header.getOrElse(HdrInstantTime, return None)
        val block = blockType match {
          case TypeAvroData =>
            val schemaJson = header.getOrElse(HdrSchema, return None)
            val schema = AvroGeneric.parseSchema(schemaJson)
              .getOrElse(return None)
            if (contentEnd - contentStart < 8) return None
            val nRecs = be32(b, contentStart + 4)
            if (nRecs < 0 || nRecs > MaxEntries) return None
            var p = contentStart + 8
            val recs = Vector.newBuilder[AvroGeneric.V]
            var r = 0
            while (r < nRecs) {
              val len = be32(b, p)
              if (len < 0 || p + 4 + len > contentEnd) return None
              val one = java.util.Arrays.copyOfRange(b, p + 4,
                p + 4 + len)
              AvroGeneric.parseDatum(one, 0, schema) match {
                case Some((v, end)) if end == len => recs += v
                case _ => return None // desync or leftover bytes
              }
              p += 4 + len
              r += 1
            }
            if (p != contentEnd) return None
            Block(blockType, instant, recs.result(), Vector.empty)
          case TypeDelete =>
            if (contentEnd - contentStart < 8) return None
            val nKeys = be32(b, contentStart + 4)
            if (nKeys < 0 || nKeys > MaxEntries) return None
            var p = contentStart + 8
            val keys = Vector.newBuilder[String]
            var r = 0
            while (r < nKeys) {
              val len = be32(b, p)
              if (len < 0 || p + 4 + len > contentEnd) return None
              keys += new String(b, p + 4, len, Utf8)
              p += 4 + len
              r += 1
            }
            if (p != contentEnd) return None
            Block(blockType, instant, Vector.empty, keys.result())
          case TypeCommand | TypeCorrupt =>
            Block(blockType, instant, Vector.empty, Vector.empty,
              header.getOrElse(HdrTargetInstant, ""))
          case _ => return None
        }
        out += block
      }
      val r = out.result()
      if (r.isEmpty) None else Some(r)
    } catch { case _: Damage => None }
  }

  // ---- write side (the fixture-free spec round trip) ---------------------

  private def wBe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def wBe64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 56
    while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
  }

  private def wMap(out: java.io.ByteArrayOutputStream,
                   m: Seq[(Int, String)]): Unit = {
    wBe32(out, m.length)
    m.foreach { case (k, v) =>
      val vb = v.getBytes(Utf8)
      wBe32(out, k); wBe32(out, vb.length); out.write(vb, 0, vb.length)
    }
  }

  /** Emit one framed block (the exact layout [[parse]] reads). */
  def writeBlock(blockType: Int, header: Seq[(Int, String)],
                 content: Array[Byte]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    wBe32(body, 1) // format version
    wBe32(body, blockType)
    wMap(body, header)
    wBe64(body, content.length.toLong)
    body.write(content, 0, content.length)
    wMap(body, Seq.empty) // footer
    val blockSize = body.size() + 8 // + trailing total-length field
    val totalLen = 6 + 8 + blockSize
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 6)
    wBe64(out, blockSize.toLong)
    body.writeTo(out)
    wBe64(out, totalLen.toLong)
    out.toByteArray
  }

  /** Avro data block content: BE32 version 1, BE32 count, BE32
    * length + bare datum per record.
    */
  def dataContent(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    wBe32(out, 1)
    wBe32(out, records.length)
    records.foreach { r => wBe32(out, r.length); out.write(r, 0, r.length) }
    out.toByteArray
  }

  /** Delete block content: BE32 version 1, BE32 count, BE32 length +
    * UTF-8 key per entry.
    */
  def deleteContent(keys: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    wBe32(out, 1)
    wBe32(out, keys.length)
    keys.foreach { k =>
      val kb = k.getBytes(Utf8)
      wBe32(out, kb.length); out.write(kb, 0, kb.length)
    }
    out.toByteArray
  }
}
