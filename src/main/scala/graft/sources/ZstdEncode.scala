package graft.sources

/** Zstandard COMPRESSOR (RFC 8878 write side): greedy LZ77 over
  * 4-byte hash chains turned into zstd sequences, encoded as
  * Compressed_Blocks with RAW literals and the three sequence
  * channels FSE-coded under the RFC's PREDEFINED distributions —
  * no table descriptions on the wire, the decoder rebuilds the same
  * tables from the spec. The backward sequence bitstream is the
  * exact mirror of [[ZstdEntropy.decompressBlock]]'s reads: fields
  * emitted in reverse decode order (per-boundary state bits OF←ML←LL,
  * per-sequence extras LL←ML←OF, init states ML←OF←LL last, padding
  * marker on top), FSE states chosen by the inverse walk over the
  * SAME table spread [[ZstdEntropy.buildFseTable]] builds, so write
  * and read agree by construction.
  *
  * The algorithm is deliberately simple and fully deterministic:
  * fixed hash, chain limit 64, greedy nearest-longest match (min 4),
  * per-64 KiB-block sequence derivation with a per-block raw
  * fallback when the entropy form does not win. Output frames are
  * single-segment with a 4-byte content size and an XXH64 content
  * checksum; ZstdSpec pins that zstd-jni (libzstd) decodes every
  * output byte-exact and the engine's own [[Zstd.walk]] round-trips
  * it.
  */
object ZstdEncode {

  private def damage(): Nothing = throw new ZstdEntropy.Damage

  // ---- FSE encode transform ----------------------------------------------

  /** The encode-side view of one predefined table: for each symbol,
    * its decode states in increasing index order (their nextState
    * values are consecutive from the effective count), plus the
    * accuracy log. Encoding runs the decoder's transition backward:
    * with encoder state X in [size, 2*size), emitting symbol s finds
    * nb with (X >> nb) in [c, 2c), outputs X's low nb bits, and moves
    * to the state whose nextState is X >> nb.
    */
  private final class FseEnc(counts: Array[Int], val log: Int) {
    private val size = 1 << log
    private val table = ZstdEntropy.buildFseTable(counts, log)
    private val cEff: Array[Int] =
      counts.map(c => if (c == -1) 1 else c)
    private val statesOf: Array[Array[Int]] = {
      val buf = Array.fill(counts.length)(Array.newBuilder[Int])
      var u = 0
      while (u < size) { buf(table.symbol(u)) += u; u += 1 }
      buf.map(_.result())
    }
    /** A canonical start state for `sym` (encoder init = the decode
      * chain's LAST state, free to choose; first spread state keeps
      * the layout deterministic).
      */
    def initState(sym: Int): Int = {
      if (sym >= statesOf.length || statesOf(sym).isEmpty) damage()
      size + statesOf(sym)(0)
    }
    /** Encode `sym` against encoder state `x`; returns (bits, nb,
      * newX) where the decoder at newX-size reads nb bits = bits to
      * land on x-size.
      */
    def encode(sym: Int, x: Int): (Int, Int, Int) = {
      if (sym >= statesOf.length || statesOf(sym).isEmpty) damage()
      val c = cEff(sym)
      var nb = 0
      while ((x >> nb) >= 2 * c) nb += 1
      val v = x >> nb
      if (v < c) damage()
      (x & ((1 << nb) - 1), nb, size + statesOf(sym)(v - c))
    }
  }

  private lazy val EncLL = new FseEnc(ZstdEntropy.PredefLLCounts, 6)
  private lazy val EncML = new FseEnc(ZstdEntropy.PredefMLCounts, 6)
  private lazy val EncOF = new FseEnc(ZstdEntropy.PredefOFCounts, 5)

  // ---- code-from-value (RFC §3.1.1.3.2.1.1) ------------------------------

  private def llCode(ll: Int): Int = {
    if (ll < 0) damage()
    if (ll <= 15) ll
    else {
      var c = ZstdEntropy.LLBase.length - 1
      while (ZstdEntropy.LLBase(c) > ll) c -= 1
      c
    }
  }

  private def mlCode(ml: Int): Int = {
    if (ml < 3) damage()
    if (ml <= 34) ml - 3
    else {
      var c = ZstdEntropy.MLBase.length - 1
      while (ZstdEntropy.MLBase(c) > ml) c -= 1
      c
    }
  }

  // ---- backward bitstream writer -----------------------------------------

  /** Collects (value, nbits) fields in DECODE order; `finish` writes
    * them REVERSED, LSB-first, so [[ZstdEntropy]]'s backward reader
    * consumes them first-to-last, then the 1-bit padding marker.
    */
  private final class BackSink {
    private val vals = Array.newBuilder[Int]
    private val lens = Array.newBuilder[Int]
    def field(v: Int, n: Int): Unit = {
      if (n < 0 || n > 31 || (n < 31 && (v >> n) != 0) || v < 0) damage()
      vals += v; lens += n
    }
    def finish(): Array[Byte] = {
      val vv = vals.result()
      val ll = lens.result()
      val out = new java.io.ByteArrayOutputStream()
      var buf = 0L
      var nb = 0
      def put(v: Int, n: Int): Unit = {
        buf |= (v.toLong & ((1L << n) - 1)) << nb
        nb += n
        while (nb >= 8) { out.write((buf & 0xff).toInt); buf >>>= 8; nb -= 8 }
      }
      var i = vv.length - 1
      while (i >= 0) { put(vv(i), ll(i)); i -= 1 }
      put(1, 1) // padding marker
      if (nb > 0) out.write((buf & 0xff).toInt)
      out.toByteArray
    }
  }

  // ---- sequence derivation (greedy LZ77) ---------------------------------

  /** One zstd sequence: `ll` literals, then a match of `ml` >= 4 at
    * `offset` back.
    */
  private final case class Seqn(ll: Int, ml: Int, offset: Int)

  /** Tokenize `data[from, until)` into sequences + trailing literal
    * count. Matches look back to `data[0]` (the whole frame window).
    */
  private def findSequences(data: Array[Byte], from: Int, until: Int,
                            head: Array[Int], prev: Array[Int])
      : (Vector[Seqn], Int) = {
    val Mask = head.length - 1
    val n = until
    def hash(i: Int): Int =
      (((data(i) & 0xff) << 18) ^ ((data(i + 1) & 0xff) << 12) ^
        ((data(i + 2) & 0xff) << 6) ^ (data(i + 3) & 0xff)) *
        0x9e3779b1 >>> (32 - Integer.numberOfTrailingZeros(head.length))
    def insert(i: Int): Unit = if (i + 4 <= n) {
      val h = hash(i) & Mask
      prev(i & Mask) = head(h)
      head(h) = i
    }
    val out = Vector.newBuilder[Seqn]
    var lit = 0
    var i = from
    while (i < until) {
      var bestLen = 0
      var bestDist = 0
      if (i + 4 <= until) {
        var cand = head(hash(i) & Mask)
        var chain = 0
        while (cand >= 0 && i - cand <= (1 << 22) && chain < 64) {
          if (cand < i) {
            var l = 0
            val maxL = math.min(65535, until - i)
            while (l < maxL && data(cand + l) == data(i + l)) l += 1
            if (l > bestLen && l >= 4) { bestLen = l; bestDist = i - cand }
          }
          val nxt = prev(cand & Mask)
          cand = if (nxt >= cand) -1 else nxt // ring-stale guard
          chain += 1
        }
      }
      if (bestLen >= 4) {
        out += Seqn(lit, bestLen, bestDist)
        lit = 0
        var k = i
        val stop = i + bestLen
        while (k < stop) { insert(k); k += 1 }
        i = stop
      } else {
        insert(i)
        lit += 1
        i += 1
      }
    }
    (out.result(), lit)
  }

  // ---- block assembly -----------------------------------------------------

  /** Raw_Literals_Block: smallest size format that fits. */
  private def rawLiteralsHeader(n: Int): Array[Byte] = {
    if (n <= 31) Array[Byte]((n << 3).toByte) // size_format 00
    else if (n <= 4095) Array[Byte]( // size_format 01 (12-bit)
      (((n & 0x0f) << 4) | 0x04).toByte, ((n >> 4) & 0xff).toByte)
    else Array[Byte]( // size_format 11 (20-bit)
      (((n & 0x0f) << 4) | 0x0c).toByte, ((n >> 4) & 0xff).toByte,
      ((n >> 12) & 0xff).toByte)
  }

  /** Encode one block's content as a Compressed_Block body, or None
    * when the entropy form does not beat storing the bytes raw.
    */
  private def compressedBlockBody(data: Array[Byte], from: Int,
                                  until: Int, head: Array[Int],
                                  prev: Array[Int]): Option[Array[Byte]] = {
    val (seqs, lastLit) = findSequences(data, from, until, head, prev)
    val blockLen = until - from
    if (seqs.isEmpty) return None // all literals: raw block wins
    val nSeq = seqs.length
    // literals buffer = the ll runs + trailing literals, in order
    val lits = new java.io.ByteArrayOutputStream()
    var p = from
    seqs.foreach { s =>
      lits.write(data, p, s.ll)
      p += s.ll + s.ml
    }
    lits.write(data, p, lastLit)
    val litBytes = lits.toByteArray
    // sequence bitstream fields, in DECODE order
    val sink = new BackSink()
    // per-channel codes
    val llCodes = seqs.map(s => llCode(s.ll))
    val mlCodes = seqs.map(s => mlCode(s.ml))
    val ofCodes = seqs.map { s =>
      val ofValue = s.offset.toLong + 3
      val c = 63 - java.lang.Long.numberOfLeadingZeros(ofValue)
      if (c > 28) damage() // beyond the predefined distribution
      c.toInt
    }
    // FSE state chains, computed backward from the last sequence
    def chain(enc: FseEnc, codes: Vector[Int])
        : (Int, Array[(Int, Int)]) = {
      var x = enc.initState(codes(nSeq - 1))
      val trans = new Array[(Int, Int)](nSeq - 1)
      var i = nSeq - 2
      while (i >= 0) {
        val (bits, nb, nx) = enc.encode(codes(i), x)
        trans(i) = (bits, nb)
        x = nx
        i -= 1
      }
      (x - (1 << enc.log), trans) // decode init state d_0
    }
    val (llInit, llTrans) = chain(EncLL, llCodes)
    val (ofInit, ofTrans) = chain(EncOF, ofCodes)
    val (mlInit, mlTrans) = chain(EncML, mlCodes)
    // decode read order: LL, OF, ML init states...
    sink.field(llInit, 6)
    sink.field(ofInit, 5)
    sink.field(mlInit, 6)
    var i = 0
    while (i < nSeq) {
      val s = seqs(i)
      // ...then per sequence: OF extra, ML extra, LL extra...
      val ofValue = s.offset.toLong + 3
      val oc = ofCodes(i)
      sink.field((ofValue - (1L << oc)).toInt, oc)
      val mc = mlCodes(i)
      sink.field(s.ml - ZstdEntropy.MLBase(mc), ZstdEntropy.MLBits(mc))
      val lc = llCodes(i)
      sink.field(s.ll - ZstdEntropy.LLBase(lc), ZstdEntropy.LLBits(lc))
      // ...then (not after the last) state bits LL, ML, OF
      if (i < nSeq - 1) {
        val (lb, ln) = llTrans(i)
        sink.field(lb, ln)
        val (mb, mn) = mlTrans(i)
        sink.field(mb, mn)
        val (ob, on) = ofTrans(i)
        sink.field(ob, on)
      }
      i += 1
    }
    val stream = sink.finish()
    val out = new java.io.ByteArrayOutputStream()
    val lh = rawLiteralsHeader(litBytes.length)
    out.write(lh, 0, lh.length)
    out.write(litBytes, 0, litBytes.length)
    // nSeq header (1-3 bytes per the spec's thresholds)
    if (nSeq < 128) out.write(nSeq)
    else if (nSeq < 0x7f00) {
      out.write(((nSeq >> 8) & 0xff) + 128); out.write(nSeq & 0xff)
    } else {
      out.write(255)
      val v = nSeq - 0x7f00
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    out.write(0) // modes byte: LL/OF/ML all predefined
    out.write(stream, 0, stream.length)
    val body = out.toByteArray
    if (body.length < blockLen) Some(body) else None
  }

  /** Compress `raw` into ONE zstd frame: single-segment, 4-byte
    * content size, XXH64 content checksum, 64 KiB input blocks each
    * emitted compressed or raw (whichever is smaller).
    */
  def compress(raw: Array[Byte]): Array[Byte] = {
    require(raw.length <= (1 << 26), s"input too large: ${raw.length}")
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    out.write(0x28); out.write(0xb5); out.write(0x2f); out.write(0xfd)
    // descriptor: FCS code 2 (4 bytes) | single-segment | checksum
    out.write(0xa4)
    val n = raw.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    val BlockIn = 1 << 16
    // hash state is FRAME-global: matches may reach earlier blocks
    // (the decoder window is the whole single-segment frame)
    val head = new Array[Int](1 << 15)
    java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](1 << 15)
    var p = 0
    do {
      val len = math.min(BlockIn, n - p)
      val last = if (p + len >= n) 1 else 0
      compressedBlockBody(raw, p, p + len, head, prev) match {
        case Some(body) =>
          val hdr = (body.length << 3) | (2 << 1) | last
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(body, 0, body.length)
        case None =>
          val hdr = (len << 3) | last
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(raw, p, len)
      }
      p += len
    } while (p < n)
    val ck = XxHash64.hash(raw, 0L)
    out.write((ck & 0xff).toInt); out.write(((ck >> 8) & 0xff).toInt)
    out.write(((ck >> 16) & 0xff).toInt)
    out.write(((ck >> 24) & 0xff).toInt)
    out.toByteArray
  }
}
