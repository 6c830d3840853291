package graft.sources

/** A from-scratch DEFLATE ENCODER (RFC 1951 write side): greedy LZ77
  * over 3-byte hash chains (window 32 KiB, match 3..258) emitted as
  * ONE fixed-Huffman block (BFINAL=1, BTYPE=01) — the write twin of
  * the inflate the engine consumes everywhere. The engine's written
  * gzip/zlib/parquet-gzip bytes genuinely compress now instead of
  * shipping stored blocks.
  *
  * The algorithm is deliberately SIMPLE and fully deterministic —
  * fixed hash (`(b0<<10)^(b1<<5)^b2 & 0x7fff`), fixed chain walk
  * limit 64, greedy longest-match with first-found (nearest) winner
  * on ties, no lazy matching — so an independent Python twin
  * reproduces the bytes exactly (md5 pin), while stdlib
  * `Inflater(raw)` / CPython `zlib.decompress(.., -15)` pin that
  * every output decodes back byte-exact.
  *
  * Spec source: RFC 1951 §3.2.5/§3.2.6 (fixed code lengths, length
  * and distance code tables).
  */
object Deflate {

  // length codes 257..285: (base, extra bits); index = code - 257
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
    19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195,
    227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  // distance codes 0..29: (base, extra bits)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
    65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073,
    4097, 6145, 8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5,
    5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  private final class BitSink(hint: Int) {
    private val out = new java.io.ByteArrayOutputStream(hint)
    private var buf = 0
    private var nb = 0
    /** LSB-first packing (extra bits, as the spec stores them). */
    def bits(v: Int, n: Int): Unit = {
      buf |= (v & ((1 << n) - 1)) << nb
      nb += n
      while (nb >= 8) { out.write(buf & 0xff); buf >>>= 8; nb -= 8 }
    }
    /** Huffman codes go MSB-of-code first → reverse then pack. */
    def code(c: Int, n: Int): Unit = {
      var r = 0
      var i = 0
      while (i < n) { r = (r << 1) | ((c >> i) & 1); i += 1 }
      bits(r, n)
    }
    def finish(): Array[Byte] = {
      if (nb > 0) { out.write(buf & 0xff); buf = 0; nb = 0 }
      out.toByteArray
    }
  }

  private def litCode(s: BitSink, v: Int): Unit =
    if (v <= 143) s.code(0x30 + v, 8)
    else if (v <= 255) s.code(0x190 + (v - 144), 9)
    else if (v <= 279) s.code(v - 256, 7)
    else s.code(0xc0 + (v - 280), 8)

  private def lenSym(l: Int): Int = {
    var i = LenBase.length - 1
    // 258 maps to code 285 (index 28), never 284+extra
    if (l == 258) return 28
    while (LenBase(i) > l) i -= 1
    i
  }

  private def distSym(d: Int): Int = {
    var i = DistBase.length - 1
    while (DistBase(i) > d) i -= 1
    i
  }

  /** Raw-deflate compress (no zlib/gzip framing): one fixed-Huffman
    * block. Always produces valid DEFLATE; on incompressible input
    * the output can exceed the input (callers needing a floor store
    * instead — the size-law queries require a genuine win on text).
    */
  def compressFixed(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val s = new BitSink(n / 2 + 16)
    s.bits(1, 1) // BFINAL
    s.bits(1, 2) // BTYPE = 01 fixed
    val HashSize = 1 << 15
    val Mask = HashSize - 1
    val head = new Array[Int](HashSize)
    java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](1 << 15)
    def hash(i: Int): Int =
      (((data(i) & 0xff) << 10) ^ ((data(i + 1) & 0xff) << 5) ^
        (data(i + 2) & 0xff)) & Mask
    def insert(i: Int): Unit = if (i + 3 <= n) {
      val h = hash(i)
      prev(i & Mask) = head(h)
      head(h) = i
    }
    var i = 0
    while (i < n) {
      var bestLen = 0
      var bestDist = 0
      if (i + 3 <= n) {
        var cand = head(hash(i))
        var chain = 0
        while (cand >= 0 && i - cand <= 32768 && chain < 64) {
          var l = 0
          val maxL = math.min(258, n - i)
          while (l < maxL && data(cand + l) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = i - cand }
          val nxt = prev(cand & Mask)
          cand = if (nxt >= cand) -1 else nxt // ring-stale guard
          chain += 1
        }
      }
      if (bestLen >= 3) {
        val ls = lenSym(bestLen)
        litCode(s, 257 + ls)
        s.bits(bestLen - LenBase(ls), LenExtra(ls))
        val ds = distSym(bestDist)
        s.code(ds, 5)
        s.bits(bestDist - DistBase(ds), DistExtra(ds))
        var j = i
        val end = i + bestLen
        while (j < end) { insert(j); j += 1 }
        i = end
      } else {
        litCode(s, data(i) & 0xff)
        insert(i)
        i += 1
      }
    }
    litCode(s, 256) // end of block
    s.finish()
  }
}
