package graft.sources

/** A from-scratch bzip2 ENCODER — the write twin of [[Bzip2]]'s
  * decoder, closing the last-but-one one-directional codec family.
  * The five reversible stages run FORWARD here:
  *
  *  1. initial RLE (runs of 4..255 identical bytes -> 4 bytes + a
  *     count byte), blocks cut at `level * 100000` RLE bytes on run
  *     boundaries;
  *  2. BWT — cyclic rotations sorted by prefix-doubling (rank pairs
  *     packed into one Long per rotation, O(n log n) sorts of a
  *     primitive array; no O(n^2) comparator walks), last column +
  *     24-bit origin pointer;
  *  3. MTF over the used-byte list with RUNA/RUNB bijective base-2
  *     runs of the zero symbol;
  *  4. multi-table Huffman: 2..6 tables by symbol-count thresholds,
  *     seeded by cumulative-frequency bands, then refined for four
  *     iterations of (assign each 50-symbol chunk to its cheapest
  *     table, recount, rebuild package-merge lengths <= 20) — the
  *     published greedy from the bzip2 format spec; selectors ride
  *     MTF + unary, code lengths delta-coded from a 5-bit seed;
  *  5. framing — 48-bit BCD block/EOS magics, per-block CRC32
  *     (MSB-first 0x04c11db7) over the ORIGINAL bytes, combined
  *     stream CRC with the rotate-left fold.
  *
  * CPython's `bz2` (libbzip2) decodes every output byte-exact
  * (Bzip2Spec); the engine's own decoder round-trips it; the q334
  * size law pins genuine compression on text.
  */
object Bzip2Encode {

  private val BlockMagic = 0x314159265359L
  private val EosMagic = 0x177245385090L

  private final class BitSink(hint: Int) {
    private val out = new java.io.ByteArrayOutputStream(hint)
    private var buf = 0L
    private var nb = 0
    /** MSB-first packing (bzip2's bit order). */
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >>> i) & 1L)
        nb += 1
        if (nb == 8) { out.write(buf.toInt & 0xff); buf = 0; nb = 0 }
        i -= 1
      }
    }
    def bit(v: Int): Unit = bits(v.toLong, 1)
    def finish(): Array[Byte] = {
      if (nb > 0) { out.write(((buf << (8 - nb)) & 0xff).toInt) }
      buf = 0; nb = 0
      out.toByteArray
    }
  }

  /** bzip2's CRC32: MSB-first, polynomial 0x04c11db7. */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private def crcOf(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0xffffffff
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    ~crc
  }

  /** Sort the cyclic rotations of `block` by prefix doubling: each
    * round sorts (rank[i], rank[(i+k) % n]) pairs packed with the
    * index into one Long (20 bits each — n <= 2^20 always holds at
    * the 900k block cap).
    */
  private def bwtOrder(block: Array[Byte]): Array[Int] = {
    val n = block.length
    require(n <= (1 << 20), s"block too large for packed ranks: $n")
    if (n == 1) return Array(0)
    var rank = new Array[Int](n)
    var scratch = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = block(i) & 0xff; i += 1 }
    val keys = new Array[Long](n)
    var k = 1
    var done = false
    while (!done) {
      i = 0
      while (i < n) {
        val r2 = rank((i + k) % n)
        keys(i) = (rank(i).toLong << 40) | (r2.toLong << 20) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      var r = 0
      scratch((keys(0) & 0xfffff).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> 20) != (keys(i - 1) >>> 20)) r += 1
        scratch((keys(i) & 0xfffff).toInt) = r
        i += 1
      }
      val t = rank; rank = scratch; scratch = t
      done = r == n - 1 || k >= n
      k <<= 1
    }
    // read the order off the LAST sorted key round: its index field
    // is the tie-break, so EQUAL rotations (periodic blocks, where
    // ranks can never fully separate) still get a consistent total
    // order — any stable order among identical rotations yields the
    // same L column and a correct inverse BWT
    val sa = new Array[Int](n)
    i = 0
    while (i < n) { sa(i) = (keys(i) & 0xfffff).toInt; i += 1 }
    sa
  }

  /** Encode one BWT block (already initial-RLE'd) into `s`;
    * `blockCrc` is over the block's ORIGINAL bytes.
    */
  private def encodeBlock(s: BitSink, rle: Array[Byte],
                          blockCrc: Int): Unit = {
    val n = rle.length
    s.bits(BlockMagic, 48)
    s.bits(blockCrc.toLong & 0xffffffffL, 32)
    s.bit(0) // not randomized
    // ---- BWT ----------------------------------------------------------
    val sa = bwtOrder(rle)
    val last = new Array[Byte](n)
    var origPtr = -1
    var i = 0
    while (i < n) {
      if (sa(i) == 0) origPtr = i
      last(i) = rle((sa(i) + n - 1) % n)
      i += 1
    }
    require(origPtr >= 0)
    s.bits(origPtr.toLong, 24)
    // ---- used map -----------------------------------------------------
    val usedFlag = new Array[Boolean](256)
    i = 0
    while (i < n) { usedFlag(last(i) & 0xff) = true; i += 1 }
    val used = (0 until 256).filter(usedFlag).toArray
    val nUsed = used.length
    var coarse = 0
    for (u <- used) coarse |= 0x8000 >> (u / 16)
    s.bits(coarse.toLong, 16)
    var blk = 0
    while (blk < 16) {
      if ((coarse & (0x8000 >> blk)) != 0) {
        var fine = 0
        var j = 0
        while (j < 16) {
          if (usedFlag(blk * 16 + j)) fine |= 0x8000 >> j
          j += 1
        }
        s.bits(fine.toLong, 16)
      }
      blk += 1
    }
    // ---- MTF + RUNA/RUNB ---------------------------------------------
    val alphaSize = nUsed + 2
    val eob = alphaSize - 1
    val pos = new Array[Int](256) // value -> current MTF index
    val mtf = new Array[Int](nUsed)
    i = 0
    while (i < nUsed) { mtf(i) = used(i); pos(used(i)) = i; i += 1 }
    val syms = Array.newBuilder[Int]
    var zeroRun = 0L
    def flushRun(): Unit = {
      var r = zeroRun
      while (r > 0) {
        if ((r & 1) == 1) { syms += 0; r = (r - 1) / 2 } // RUNA
        else { syms += 1; r = (r - 2) / 2 }              // RUNB
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val v = last(i) & 0xff
      val j = pos(v)
      if (j == 0) zeroRun += 1
      else {
        flushRun()
        syms += (j + 1)
        // move v to front
        var k2 = j
        while (k2 > 0) {
          mtf(k2) = mtf(k2 - 1); pos(mtf(k2)) = k2; k2 -= 1
        }
        mtf(0) = v; pos(v) = 0
      }
      i += 1
    }
    flushRun()
    syms += eob
    val mtfv = syms.result()
    val nMtf = mtfv.length
    // ---- multi-table Huffman (the spec's iterative greedy) ------------
    val nGroups =
      if (nMtf < 200) 2
      else if (nMtf < 600) 3
      else if (nMtf < 1200) 4
      else if (nMtf < 2400) 5
      else 6
    val freq = new Array[Long](alphaSize)
    mtfv.foreach(freq(_) += 1)
    // seed: the spec's cumulative-frequency band partition — each
    // table starts "cheap" (cost 0) on its band, "dear" (15) outside;
    // the refinement loop below reshapes them into real code lengths
    val lens = Array.ofDim[Int](nGroups, alphaSize)
    locally {
      var gs = 0
      var remF = nMtf.toLong
      var nPart = nGroups
      while (nPart > 0) {
        val tFreq = remF / nPart
        var ge = gs - 1
        var aFreq = 0L
        while (aFreq < tFreq && ge < alphaSize - 1) {
          ge += 1
          aFreq += freq(ge)
        }
        if (ge > gs && nPart != nGroups && nPart != 1 &&
          ((nGroups - nPart) % 2 == 1)) {
          aFreq -= freq(ge)
          ge -= 1
        }
        val g0 = nGroups - nPart
        var a = 0
        while (a < alphaSize) {
          lens(g0)(a) = if (a >= gs && a <= ge) 0 else 15
          a += 1
        }
        gs = ge + 1
        remF -= aFreq
        nPart -= 1
      }
    }
    val nChunks = (nMtf + 49) / 50
    val selectors = new Array[Int](nChunks)
    var iter = 0
    while (iter < 4) {
      val rf = Array.ofDim[Long](nGroups, alphaSize)
      var c = 0
      while (c < nChunks) {
        val lo = c * 50
        val hi = math.min(nMtf, lo + 50)
        var best = 0
        var bestCost = Long.MaxValue
        var g = 0
        while (g < nGroups) {
          var cost = 0L
          var t = lo
          while (t < hi) { cost += lens(g)(mtfv(t)); t += 1 }
          if (cost < bestCost) { bestCost = cost; best = g }
          g += 1
        }
        selectors(c) = best
        var t = lo
        while (t < hi) { rf(best)(mtfv(t)) += 1; t += 1 }
        c += 1
      }
      var g = 0
      while (g < nGroups) {
        // bzlib's freq floor: every symbol encodable by every table
        val f = rf(g).map(v => math.max(1L, v))
        val ll = Deflate.limitedLengths(f, 20)
        var a = 0
        while (a < alphaSize) { lens(g)(a) = ll(a); a += 1 }
        g += 1
      }
      iter += 1
    }
    // canonical codes per table (RFC-style canonical order is what
    // the decoder's hbCreateDecodeTables rebuilds from lengths)
    val codes = Array.ofDim[Int](nGroups, alphaSize)
    var g = 0
    while (g < nGroups) {
      val maxLen = lens(g).max
      val minLen = lens(g).min
      var code = 0
      var l = minLen
      while (l <= maxLen) {
        var a = 0
        while (a < alphaSize) {
          if (lens(g)(a) == l) { codes(g)(a) = code; code += 1 }
          a += 1
        }
        code <<= 1
        l += 1
      }
      g += 1
    }
    s.bits(nGroups.toLong, 3)
    s.bits(nChunks.toLong, 15)
    // selectors, MTF + unary
    val gmtf = Array.tabulate(nGroups)(identity)
    var c = 0
    while (c < nChunks) {
      val want = selectors(c)
      var j = 0
      while (gmtf(j) != want) j += 1
      var u = 0
      while (u < j) { s.bit(1); u += 1 }
      s.bit(0)
      while (j > 0) { gmtf(j) = gmtf(j - 1); j -= 1 }
      gmtf(0) = want
      c += 1
    }
    // delta-coded lengths
    g = 0
    while (g < nGroups) {
      var curr = lens(g)(0)
      s.bits(curr.toLong, 5)
      var a = 0
      while (a < alphaSize) {
        while (curr < lens(g)(a)) { s.bit(1); s.bit(0); curr += 1 }
        while (curr > lens(g)(a)) { s.bit(1); s.bit(1); curr -= 1 }
        s.bit(0)
        a += 1
      }
      g += 1
    }
    // symbol stream
    var t = 0
    while (t < nMtf) {
      val gSel = selectors(t / 50)
      val sym = mtfv(t)
      s.bits(codes(gSel)(sym).toLong, lens(gSel)(sym))
      t += 1
    }
  }

  /** Compress `data` into one .bz2 stream at `level` (block size
    * level*100000). Deterministic; decoded byte-exact by libbzip2
    * (CPython bz2) and the engine's own [[Bzip2.decompress]].
    */
  def compress(data: Array[Byte], level: Int = 9): Array[Byte] = {
    require(level >= 1 && level <= 9, s"level $level")
    require(data.length <= (1 << 26), s"input too large: ${data.length}")
    val maxBlock = level * 100000
    val s = new BitSink(data.length / 3 + 64)
    s.bits('B', 8); s.bits('Z', 8); s.bits('h', 8)
    s.bits(('0' + level).toLong, 8)
    var combined = 0
    // ---- initial RLE, cut into blocks on emission boundaries ----------
    var p = 0
    val n = data.length
    while (p < n) {
      val blockStart = p
      val rle = new java.io.ByteArrayOutputStream(
        math.min(maxBlock, n - p) + 8)
      while (p < n && rle.size() < maxBlock - 6) {
        val v = data(p)
        var run = 1
        while (p + run < n && run < 255 + 4 && data(p + run) == v)
          run += 1
        if (run >= 4) {
          rle.write(v); rle.write(v); rle.write(v); rle.write(v)
          rle.write(run - 4)
          p += run
        } else {
          var k = 0
          while (k < run) { rle.write(v); k += 1 }
          p += run
        }
      }
      val blockCrc = crcOf(data, blockStart, p)
      encodeBlock(s, rle.toByteArray, blockCrc)
      combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
    }
    s.bits(EosMagic, 48)
    s.bits(combined.toLong & 0xffffffffL, 32)
    s.finish()
  }
}
