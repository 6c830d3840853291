package graft.sources

/** XZ container walk (tukaani.org/xz/xz-file-format.txt — the public
  * spec): stream header (magic + flags + CRC32-of-flags), blocks
  * (CRC32-verified block headers naming the filter chain, LZMA2
  * payloads walked chunk by chunk — the framing is self-delimiting —
  * then padding and the declared check), the INDEX (one record per
  * block whose unpadded/uncompressed sizes must match the walked
  * truth), and the stream footer (CRC32-verified backward size that
  * must point back at the index, flags equal to the header's, "YZ").
  *
  * This is the q243 posture on the other archive codec: the census
  * must be derivable from the container alone — the index IS how a
  * reader seeks into a multi-gigabyte .xz without decompressing it —
  * and every structural claim is cross-checked against the walked
  * blocks, CRCs included. Payload DECODE (the LZMA range coder) is
  * [[Lzma2]]'s job; this walk only frames it.
  *
  * Totality law: any malformation — bad magic, reserved flag bits, a
  * header CRC mismatch, a chunk past its block, index records
  * disagreeing with the walk, a footer pointing elsewhere — is None.
  */
object Xz {

  final case class BlockInfo(headerSize: Int, filterId: Long,
                             dataStart: Int, packedLen: Long,
                             unpackedLen: Long, unpaddedSize: Long,
                             /** LZMA2 chunk starts+controls, for the
                               * decoder. */
                             chunks: Seq[(Int, Int)])
  final case class XzInfo(checkType: Int, blocks: Seq[BlockInfo],
                          indexUncompressed: Long)

  /** Check-type names per the spec's table (0 none, 1 CRC32,
    * 4 CRC64, 10 SHA-256).
    */
  def checkName(t: Int): String = t match {
    case 0 => "none"
    case 1 => "crc32"
    case 4 => "crc64"
    case 10 => "sha256"
    case _ => s"reserved-$t"
  }

  private def checkLen(t: Int): Int = t match {
    case 0 => 0
    case 1 => 4
    case 4 => 8
    case 10 => 32
    case _ => -1
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | (b(p + 1) & 0xffL) << 8 |
      (b(p + 2) & 0xffL) << 16 | (b(p + 3) & 0xffL) << 24

  /** Single-stream parse: the whole byte object must be exactly one
    * stream.
    */
  def parse(b: Array[Byte]): Option[XzInfo] =
    parseStream(b, 0).collect { case (info, end) if end == b.length =>
      info }

  /** CONCATENATED streams (`cat a.xz b.xz` is a valid .xz): streams
    * separated by optional 4-byte-aligned zero padding, each walked
    * with the full single-stream discipline. None on anything left
    * over.
    */
  def parseAll(b: Array[Byte]): Option[Seq[XzInfo]] = {
    val out = Seq.newBuilder[XzInfo]
    var p = 0
    var n = 0
    while (p < b.length) {
      // stream padding: zeros in multiples of 4
      if (b(p) == 0) {
        val start = p
        while (p < b.length && b(p) == 0) p += 1
        if ((p - start) % 4 != 0) return None
        // stream padding is only legal AFTER a stream: all-zero input
        // must not parse as a valid .xz with zero streams
        if (p >= b.length)
          return if (n == 0) None else Some(out.result())
      }
      parseStream(b, p) match {
        case Some((info, end)) => out += info; p = end; n += 1
        case None => return None
      }
      if (n > (1 << 16)) return None
    }
    val r = out.result()
    if (r.isEmpty) None else Some(r)
  }

  private def parseStream(b: Array[Byte],
                          start: Int): Option[(XzInfo, Int)] = {
    var p = start
    def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    // xz multibyte integers: 7-bit little-endian, high bit continues
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        if (p >= b.length || shift > 62) return -1L
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      -1L
    }
    try {
      if (b.length - start < 32) return None
      // ---- stream header -------------------------------------------
      if (u8() != 0xfd || u8() != '7' || u8() != 'z' || u8() != 'X' ||
        u8() != 'Z' || u8() != 0x00) return None
      val flagsOff = p
      val f0 = u8(); val f1 = u8()
      if (f0 != 0 || (f1 & 0xf0) != 0) return None // reserved bits
      val check = f1 & 0x0f
      val cl = checkLen(check)
      if (cl < 0) return None
      if (le32(b, p) != crc32(b, flagsOff, 2)) return None
      p += 4
      // ---- blocks ---------------------------------------------------
      val blocks = Seq.newBuilder[BlockInfo]
      var nBlocks = 0
      while (p < b.length && b(p) != 0x00) {
        val hdrStart = p
        val hdrSizeByte = u8()
        val realHeader = (hdrSizeByte + 1) * 4
        if (hdrStart + realHeader + 4 > b.length) return None
        val bf = u8()
        val nFilters = (bf & 3) + 1
        if ((bf & 0x3c) != 0) return None // reserved
        val hasComp = (bf & 0x40) != 0
        val hasUncomp = (bf & 0x80) != 0
        val declComp = if (hasComp) varint() else -1L
        val declUncomp = if (hasUncomp) varint() else -1L
        if (hasComp && declComp < 0) return None
        if (hasUncomp && declUncomp < 0) return None
        var filterId = -1L
        var i = 0
        while (i < nFilters) {
          val id = varint()
          val propsLen = varint()
          if (id < 0 || propsLen < 0 ||
            p + propsLen > hdrStart + realHeader - 4) return None
          p += propsLen.toInt
          if (i == nFilters - 1) filterId = id // last = innermost
          i += 1
        }
        // padding to the declared size must be zeros
        while (p < hdrStart + realHeader - 4) {
          if (b(p) != 0) return None
          p += 1
        }
        if (le32(b, p) != crc32(b, hdrStart, realHeader - 4))
          return None
        p += 4
        if (filterId != 0x21) return None // LZMA2 only (this corpus)
        // ---- LZMA2 chunk walk (self-delimiting framing) ------------
        val dataStart = p
        val chunks = Seq.newBuilder[(Int, Int)]
        var unpacked = 0L
        var done = false
        while (!done) {
          if (p >= b.length) return None
          val c = u8()
          if (c == 0x00) done = true
          else if (c == 0x01 || c == 0x02) {
            // uncompressed chunk: BE16 size-1, raw bytes
            if (p + 2 > b.length) return None
            val sz = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
            p += 2
            chunks += ((p - 3, c))
            if (p + sz > b.length) return None
            p += sz
            unpacked += sz
          } else if ((c & 0x80) != 0) {
            if (p + 4 > b.length) return None
            val usz = ((c & 0x1f).toLong << 16 |
              (b(p) & 0xffL) << 8 | (b(p + 1) & 0xffL)) + 1
            val csz = (((b(p + 2) & 0xff) << 8) |
              (b(p + 3) & 0xff)) + 1
            p += 4
            val reset = (c >> 5) & 3
            if (reset >= 2) { // new props byte
              if (p >= b.length) return None
              p += 1
            }
            chunks += ((p - (if (reset >= 2) 6 else 5), c))
            if (p + csz > b.length) return None
            p += csz
            unpacked += usz
          } else return None
        }
        val compLen = (p - dataStart).toLong
        if (hasComp && declComp != compLen) return None
        if (hasUncomp && declUncomp != unpacked) return None
        // block padding to a 4-byte boundary, zeros
        while ((p - 0) % 4 != 0) {
          if (p >= b.length || b(p) != 0) return None
          p += 1
        }
        // the check (over UNCOMPRESSED data — verified by the decoder)
        if (p + cl > b.length) return None
        p += cl
        val unpadded = realHeader.toLong + compLen + cl
        blocks += BlockInfo(realHeader, filterId, dataStart, compLen,
          unpacked, unpadded, chunks.result())
        nBlocks += 1
        if (nBlocks > (1 << 20)) return None
      }
      // ---- index ----------------------------------------------------
      val idxStart = p
      if (p >= b.length || u8() != 0x00) return None
      val cnt = varint()
      val walked = blocks.result()
      if (cnt != walked.length.toLong) return None
      var idxUncomp = 0L
      walked.foreach { blk =>
        val unp = varint()
        val unc = varint()
        if (unp != blk.unpaddedSize || unc != blk.unpackedLen)
          return None
        idxUncomp += unc
      }
      while ((p - idxStart) % 4 != 0) {
        if (p >= b.length || b(p) != 0) return None
        p += 1
      }
      if (p + 4 > b.length ||
        le32(b, p) != crc32(b, idxStart, p - idxStart)) return None
      p += 4
      val idxRealSize = p - idxStart
      // ---- footer ---------------------------------------------------
      if (p + 12 > b.length) return None
      val footCrc = le32(b, p)
      if (footCrc != crc32(b, p + 4, 6)) return None
      val backward = (le32(b, p + 4) + 1) * 4
      if (backward != idxRealSize.toLong) return None
      if (b(p + 8) != 0x00 || (b(p + 9) & 0xff) != (check | 0x00))
        return None
      if (b(p + 10) != 'Y' || b(p + 11) != 'Z') return None
      Some((XzInfo(check, walked, idxUncomp), p + 12))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
