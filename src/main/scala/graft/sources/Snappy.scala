package graft.sources

/** Raw snappy block-format decompressor, from the public format
  * description (google/snappy `format_description.txt`): a little-endian
  * varint preamble carrying the uncompressed length, then a tag stream —
  * literals (tag & 3 == 0, 6-bit length or 1–4 trailing LE length
  * bytes) and back-references at three offset widths (tag & 3 == 1:
  * 11-bit offset + 4..11 length; == 2: 16-bit LE offset; == 3: 32-bit
  * LE offset). Copies may overlap their own output (offset < length
  * repeats a pattern), which is why the copy loop is byte-at-a-time.
  *
  * Why the engine owns this: snappy is the DEFAULT parquet codec of
  * both pyarrow and Spark, so a lake audit that decodes pages from raw
  * bytes (sources/Parquet.scala) meets it in the first file it opens.
  * Nothing here links against snappy-java — SnappySpec pins this
  * decoder AGAINST snappy-java as the independent writer, both on
  * round-trips and on the q240 fixture chunks.
  *
  * Totality law (the house posture): any malformation — preamble
  * disagreeing with the expected length, a tag running past the input,
  * an offset before the start of output, output over- or under-run —
  * yields None, never a throw and never partial garbage.
  */
object Snappy {

  /** Decompress `b[off, off+len)` to EXACTLY `want` bytes. */
  def uncompress(b: Array[Byte], off: Int, len: Int,
                 want: Int): Option[Array[Byte]] = {
    if (off < 0 || len < 0 || want < 0 || off + len > b.length ||
      off + len < 0) return None
    val end = off + len
    var p = off

    // preamble: uvarint32 uncompressed length, max 5 bytes
    var declared = 0L
    var shift = 0
    var cont = true
    while (cont) {
      if (p >= end || shift > 28) return None
      val x = b(p) & 0xff; p += 1
      declared |= (x & 0x7fL) << shift; shift += 7
      cont = (x & 0x80) != 0
    }
    if (declared != want) return None

    val out = new Array[Byte](want)
    var o = 0
    while (p < end) {
      val tag = b(p) & 0xff; p += 1
      (tag & 3) match {
        case 0 => // literal
          var n = (tag >> 2) + 1
          if (n > 60) {
            val extra = n - 60 // 1..4 trailing LE length bytes
            if (p + extra > end) return None
            var v = 0L
            var i = 0
            while (i < extra) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
            p += extra
            if (v > Int.MaxValue - 1) return None
            n = v.toInt + 1
          }
          // Long comparisons: a 4-byte length can put n near
          // Int.MaxValue, where `p + n` wraps negative and a forged
          // ~12-byte page would slip past an Int bounds check
          if (p.toLong + n > end || o.toLong + n > want) return None
          System.arraycopy(b, p, out, o, n)
          p += n; o += n
        case c =>
          var n = 0; var offset = 0
          if (c == 1) {
            if (p >= end) return None
            n = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | (b(p) & 0xff); p += 1
          } else if (c == 2) {
            if (p + 2 > end) return None
            n = (tag >> 2) + 1
            offset = (b(p) & 0xff) | (b(p + 1) & 0xff) << 8; p += 2
          } else {
            if (p + 4 > end) return None
            n = (tag >> 2) + 1
            val v = (b(p) & 0xffL) | (b(p + 1) & 0xffL) << 8 |
              (b(p + 2) & 0xffL) << 16 | (b(p + 3) & 0xffL) << 24
            p += 4
            if (v > Int.MaxValue) return None
            offset = v.toInt
          }
          if (offset <= 0 || offset > o || o + n > want) return None
          // overlap-safe: a copy may read bytes it just wrote
          var i = 0
          while (i < n) { out(o + i) = out(o + i - offset); i += 1 }
          o += n
      }
    }
    if (o == want) Some(out) else None
  }

  /** Whole-array convenience form. */
  def uncompress(b: Array[Byte], want: Int): Option[Array[Byte]] =
    uncompress(b, 0, b.length, want)

  /** Emit a VALID snappy stream storing `b` as one literal run:
    * uvarint preamble + (for non-empty input) a literal tag —
    * ≤60 bytes inline in the tag, else the 4-byte LE length form —
    * then the bytes verbatim. Deterministic by construction (the Avro
    * snappy-codec writer needs byte-reproducible output for the
    * size-oracle law); any spec-conforming snappy decoder, including
    * [[uncompress]], reads it back.
    */
  def compressStored(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    var z = b.length.toLong
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7
    }
    out.write(z.toInt)
    if (b.length > 0) {
      if (b.length <= 60) out.write((b.length - 1) << 2)
      else {
        out.write(0xfc) // literal, 4 trailing LE length bytes
        val n = b.length - 1
        out.write(n & 0xff); out.write((n >> 8) & 0xff)
        out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
      }
      out.write(b, 0, b.length)
    }
    out.toByteArray
  }

  /** Uncompress trusting the block's OWN preamble for the output
    * size, bounded by `cap` — ORC's chunk framing carries no
    * uncompressed length, only the codec's. A preamble past the cap
    * is the adversarial-allocation case and refuses.
    */
  def uncompressSelf(b: Array[Byte], off: Int, len: Int,
                     cap: Int): Option[Array[Byte]] = {
    if (off < 0 || len < 0 || cap < 0 || off.toLong + len > b.length)
      return None
    var declared = 0L
    var shift = 0
    var p = off
    var cont = true
    while (cont) {
      if (p >= off + len || shift > 28) return None
      val x = b(p) & 0xff; p += 1
      declared |= (x & 0x7fL) << shift; shift += 7
      cont = (x & 0x80) != 0
    }
    if (declared > cap) return None
    uncompress(b, off, len, declared.toInt)
  }
}
