package graft.sources

/** A from-scratch DEFLATE ENCODER (RFC 1951 write side): greedy LZ77
  * over 3-byte hash chains (window 32 KiB, match 3..258) emitted as
  * ONE block — fixed-Huffman (BTYPE=01, [[compressFixed]]) or
  * dynamic-Huffman (BTYPE=10, [[compressDynamic]], q333: per-input
  * package-merge codes shipped through §3.2.7's code-length code);
  * [[compress]] picks whichever is smaller. The write twin of the
  * engine's own [[Inflate]] decoder. The engine's written
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

  /** The shared greedy LZ77 pass: tokens as (litOrLen, dist) pairs —
    * dist == 0 marks a literal byte in `litOrLen`; dist > 0 a match
    * of length `litOrLen`. Extracted so the fixed and dynamic block
    * emitters make IDENTICAL match decisions (the md5 pins on the
    * fixed path hold, and the dynamic size-law comparison is
    * entropy-coding-only).
    */
  private def lz77(data: Array[Byte]): (Array[Int], Array[Int]) = {
    val n = data.length
    val toks = Array.newBuilder[Int]
    val dists = Array.newBuilder[Int]
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
        toks += bestLen
        dists += bestDist
        var j = i
        val end = i + bestLen
        while (j < end) { insert(j); j += 1 }
        i = end
      } else {
        toks += (data(i) & 0xff)
        dists += 0
        insert(i)
        i += 1
      }
    }
    (toks.result(), dists.result())
  }

  /** Raw-deflate compress (no zlib/gzip framing): one fixed-Huffman
    * block. Always produces valid DEFLATE; on incompressible input
    * the output can exceed the input (callers needing a floor store
    * instead — the size-law queries require a genuine win on text).
    */
  def compressFixed(data: Array[Byte]): Array[Byte] = {
    val (toks, dists) = lz77(data)
    val s = new BitSink(data.length / 2 + 16)
    s.bits(1, 1) // BFINAL
    s.bits(1, 2) // BTYPE = 01 fixed
    var t = 0
    while (t < toks.length) {
      if (dists(t) == 0) litCode(s, toks(t))
      else {
        val ls = lenSym(toks(t))
        litCode(s, 257 + ls)
        s.bits(toks(t) - LenBase(ls), LenExtra(ls))
        val ds = distSym(dists(t))
        s.code(ds, 5)
        s.bits(dists(t) - DistBase(ds), DistExtra(ds))
      }
      t += 1
    }
    litCode(s, 256) // end of block
    s.finish()
  }

  /** Optimal length-limited code lengths by package-merge (limit L,
    * deterministic tie-breaks — items before packages, lower symbol
    * first). Degenerate single-symbol alphabets get length 1 (the
    * one-bit code §3.2.7 permits). Same construction as the zstd
    * encoder's Huffman literals — optimality makes the q333 size law
    * a property of the FORMAT, not of encoder luck.
    */
  private[sources] def limitedLengths(freqs: Array[Long], L: Int): Array[Int] = {
    val present = freqs.indices.filter(freqs(_) > 0)
    val lengths = new Array[Int](freqs.length)
    if (present.isEmpty) return lengths
    if (present.length == 1) { lengths(present.head) = 1; return lengths }
    final case class Coin(w: Long, cnt: Array[Int])
    val items = present.map { sym =>
      val c = new Array[Int](freqs.length)
      c(sym) = 1
      Coin(freqs(sym), c)
    }.sortBy(c => (c.w, c.cnt.indexOf(1))).toVector
    var list = items
    var d = L - 1
    while (d >= 1) {
      val packages = list.grouped(2).collect {
        case Vector(a, b) =>
          val c = new Array[Int](freqs.length)
          var i = 0
          while (i < c.length) { c(i) = a.cnt(i) + b.cnt(i); i += 1 }
          Coin(a.w + b.w, c)
      }.toVector
      val out = Vector.newBuilder[Coin]
      var ii = 0
      var pi = 0
      while (ii < items.length || pi < packages.length) {
        if (pi >= packages.length ||
          (ii < items.length && items(ii).w <= packages(pi).w)) {
          out += items(ii); ii += 1
        } else { out += packages(pi); pi += 1 }
      }
      list = out.result()
      d -= 1
    }
    list.take(2 * (present.length - 1)).foreach { c =>
      var i = 0
      while (i < c.cnt.length) { lengths(i) += c.cnt(i); i += 1 }
    }
    lengths
  }

  /** Canonical codes from lengths (RFC 1951 §3.2.2). */
  private def canonical(lens: Array[Int]): Array[Int] = {
    val maxLen = if (lens.isEmpty) 0 else lens.max
    val blCount = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    lens.map { ln =>
      if (ln == 0) 0
      else { val c = nextCode(ln); nextCode(ln) += 1; c }
    }
  }

  /** §3.2.7's code-length-code transmission order. */
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
    12, 3, 13, 2, 14, 1, 15)

  /** Raw-deflate compress as ONE DYNAMIC-HUFFMAN block (BTYPE=10,
    * RFC 1951 §3.2.7): the same LZ77 tokens as [[compressFixed]],
    * entropy-coded with per-input package-merge codes — the header
    * ships both code-length vectors through the 19-symbol
    * code-length code (16/17/18 run symbols, HCLEN-trimmed permuted
    * order). On skewed-symbol corpora this strictly beats the fixed
    * block (q333's pinned law); stdlib Inflater and the engine's own
    * [[Inflate]] both decode it byte-exact.
    */
  def compressDynamic(data: Array[Byte]): Array[Byte] = {
    val (toks, dists) = lz77(data)
    // frequencies over the actual token stream (+ end-of-block)
    val litFreq = new Array[Long](286)
    val distFreq = new Array[Long](30)
    var t = 0
    while (t < toks.length) {
      if (dists(t) == 0) litFreq(toks(t)) += 1
      else {
        litFreq(257 + lenSym(toks(t))) += 1
        distFreq(distSym(dists(t))) += 1
      }
      t += 1
    }
    litFreq(256) += 1
    val litLens = limitedLengths(litFreq, 15)
    // zlib requires a COMPLETE lit/len code (incomplete is legal only
    // for the one-distance-code case): pad the degenerate one-symbol
    // alphabet (empty input -> only 256) with a second 1-bit code
    if (litFreq.count(_ > 0) == 1) litLens(0) = 1
    val distLens = limitedLengths(distFreq, 15)
    // no distance codes at all: §3.2.7 still transmits HDIST=1; give
    // code 0 a one-bit length (legal, never used)
    if (distLens.forall(_ == 0)) distLens(0) = 1
    val litCodes = canonical(litLens)
    val distCodes = canonical(distLens)
    val hlit = math.max(257, litLens.lastIndexWhere(_ > 0) + 1)
    val hdist = math.max(1, distLens.lastIndexWhere(_ > 0) + 1)
    // ---- code-length sequence with 16/17/18 run symbols -------------
    val seq = litLens.take(hlit) ++ distLens.take(hdist)
    val clSyms = Array.newBuilder[(Int, Int)] // (symbol, extra value)
    var i = 0
    while (i < seq.length) {
      val v = seq(i)
      var j = i + 1
      while (j < seq.length && seq(j) == v) j += 1
      var run = j - i
      if (v == 0) {
        while (run >= 11) {
          val take = math.min(138, run)
          clSyms += ((18, take - 11)); run -= take
        }
        while (run >= 3) {
          val take = math.min(10, run)
          clSyms += ((17, take - 3)); run -= take
        }
        while (run > 0) { clSyms += ((0, -1)); run -= 1 }
      } else {
        clSyms += ((v, -1)); run -= 1
        while (run >= 3) {
          val take = math.min(6, run)
          clSyms += ((16, take - 3)); run -= take
        }
        while (run > 0) { clSyms += ((v, -1)); run -= 1 }
      }
      i = j
    }
    val cl = clSyms.result()
    val clFreq = new Array[Long](19)
    cl.foreach { case (sym, _) => clFreq(sym) += 1 }
    val clLens = limitedLengths(clFreq, 7)
    // same completeness law for the code-length code itself
    if (clFreq.count(_ > 0) == 1)
      clLens(if (clFreq(0) > 0) 8 else 0) = 1
    val clCodes = canonical(clLens)
    val hclen = math.max(4,
      ClOrder.lastIndexWhere(o => clLens(o) > 0) + 1)
    // ---- emit --------------------------------------------------------
    val s = new BitSink(data.length / 2 + 64)
    s.bits(1, 1) // BFINAL
    s.bits(2, 2) // BTYPE = 10 dynamic
    s.bits(hlit - 257, 5)
    s.bits(hdist - 1, 5)
    s.bits(hclen - 4, 4)
    var k = 0
    while (k < hclen) { s.bits(clLens(ClOrder(k)), 3); k += 1 }
    cl.foreach { case (sym, extra) =>
      s.code(clCodes(sym), clLens(sym))
      sym match {
        case 16 => s.bits(extra, 2)
        case 17 => s.bits(extra, 3)
        case 18 => s.bits(extra, 7)
        case _ => ()
      }
    }
    t = 0
    while (t < toks.length) {
      if (dists(t) == 0) s.code(litCodes(toks(t)), litLens(toks(t)))
      else {
        val ls = lenSym(toks(t))
        s.code(litCodes(257 + ls), litLens(257 + ls))
        s.bits(toks(t) - LenBase(ls), LenExtra(ls))
        val ds = distSym(dists(t))
        s.code(distCodes(ds), distLens(ds))
        s.bits(dists(t) - DistBase(ds), DistExtra(ds))
      }
      t += 1
    }
    s.code(litCodes(256), litLens(256))
    s.finish()
  }

  /** Best-of raw-deflate: the dynamic block when it is strictly
    * smaller, the fixed block otherwise — both decode everywhere;
    * callers get the better entropy coding for free.
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val fixed = compressFixed(data)
    val dyn = compressDynamic(data)
    if (dyn.length < fixed.length) dyn else fixed
  }
}
