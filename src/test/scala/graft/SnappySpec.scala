package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Snappy => GSnappy}

/** The from-scratch snappy block decoder, pinned against snappy-java
  * (org.xerial.snappy — the INDEPENDENT implementation Spark itself
  * ships) as the writer, plus hand-built tag streams for the corners a
  * real compressor rarely emits and the fail-closed damage shapes.
  */
class SnappySpec extends AnyFunSuite {

  // deterministic pseudo-random bytes (no Math.random in tests either)
  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  test("snappy-java round trips: every payload snappy-java compresses, " +
    "the engine decoder inflates byte-for-byte") {
    val shapes: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "a".getBytes,
      "snappy".getBytes,
      ("ab" * 5000).getBytes, // long repeats: overlapping copies
      lcgBytes(100, 1L), // short incompressible
      lcgBytes(70000, 2L), // incompressible: >60-byte literals
      // long-range matches: the same 512-byte block recurring beyond
      // a 64 KB gap forces wide offsets
      {
        val blk = lcgBytes(512, 3L)
        val mid = lcgBytes(70000, 4L)
        blk ++ mid ++ blk ++ blk
      },
      ("text with some text and more text, text text " * 3000).getBytes)
    for ((src, i) <- shapes.zipWithIndex) {
      val comp = org.xerial.snappy.Snappy.compress(src)
      val got = GSnappy.uncompress(comp, src.length)
        .getOrElse(fail(s"shape $i must decode"))
      assert(java.util.Arrays.equals(got, src), s"shape $i")
      // and the wrong expected length must refuse, both directions
      assert(GSnappy.uncompress(comp, src.length + 1).isEmpty, s"shape $i")
      if (src.length > 0)
        assert(GSnappy.uncompress(comp, src.length - 1).isEmpty, s"shape $i")
    }
  }

  test("hand-built tag streams: every copy width, 1..4-byte literal " +
    "lengths, pattern-repeating overlap") {
    def varint(v: Int): Array[Byte] = {
      var x = v
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((x & ~0x7f) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += x.toByte
      out.toArray
    }
    // overlap: literal "ab" then a copy-1 (offset 2, len 8) = "ab"*5
    val overlap = varint(10) ++
      Array[Byte]((1 << 2).toByte, 'a', 'b') ++ // literal len 2
      Array[Byte](((4 << 2) | 1).toByte, 2) // copy-1: len 4+4=8, off 2
    assert(GSnappy.uncompress(overlap, 10)
      .map(new String(_)).contains("ababababab"))

    // copy-2: 16-bit offset
    val lit64 = lcgBytes(300, 9L)
    val c2 = varint(300 + 20) ++
      Array[Byte]((60 << 2).toByte, 43) ++ lit64.take(44) ++ // 1-byte len
      Array[Byte]((61 << 2).toByte, 255.toByte, 0) ++
      lit64.slice(44, 300) ++ // 2-byte len: 255 + 1 = 256
      Array[Byte](((20 - 1) << 2 | 2).toByte, 44, 1) // off 300, len 20
    val got2 = GSnappy.uncompress(c2, 320).getOrElse(fail("c2"))
    assert(java.util.Arrays.equals(got2.take(300), lit64))
    assert(java.util.Arrays.equals(got2.drop(300),
      lit64.slice(0, 20)))

    // copy-4: 32-bit offset (pointing 70000 back)
    val big = lcgBytes(70000, 10L)
    val comp = org.xerial.snappy.Snappy.compress(big)
    val c4 = {
      // re-wrap: decompressed big, then a hand 4-byte-offset copy of
      // its first 8 bytes — splice onto snappy-java's stream by
      // re-encoding: preamble(70008) + literal(70000) + copy4
      varint(70008) ++
        Array[Byte]((63 << 2).toByte) ++
        Array[Byte]((69999 & 0xff).toByte, ((69999 >> 8) & 0xff).toByte,
          ((69999 >> 16) & 0xff).toByte, 0) ++
        big ++
        Array[Byte](((8 - 1) << 2 | 3).toByte,
          (70000 & 0xff).toByte, ((70000 >> 8) & 0xff).toByte,
          ((70000 >> 16) & 0xff).toByte, 0)
    }
    val got4 = GSnappy.uncompress(c4, 70008).getOrElse(fail("c4"))
    assert(java.util.Arrays.equals(got4.take(70000), big))
    assert(java.util.Arrays.equals(got4.drop(70000), big.take(8)))
    // snappy-java agrees our hand stream is valid snappy
    assert(java.util.Arrays.equals(
      org.xerial.snappy.Snappy.uncompress(c4), got4))
    assert(comp.length < big.length + 4000) // sanity: roughly stored

    // bit-identical cross-check the OTHER direction: snappy-java
    // decodes the same hand-built streams we decode
    for ((s, want) <- Seq((overlap, 10), (c2, 320))) {
      val theirs = org.xerial.snappy.Snappy.uncompress(s)
      assert(theirs.length == want)
      assert(GSnappy.uncompress(s, want).exists(
        java.util.Arrays.equals(_, theirs)))
    }
  }

  test("damage fails closed: truncation, preamble lies, offsets before " +
    "the start, output overrun, trailing garbage") {
    val src = ("payload " * 100).getBytes
    val comp = org.xerial.snappy.Snappy.compress(src)
    // truncations at every prefix must refuse (never throw)
    for (k <- 0 until comp.length)
      assert(GSnappy.uncompress(comp.take(k), src.length).isEmpty, s"len $k")
    // preamble forged
    val lied = comp.clone(); lied(0) = (lied(0) ^ 1).toByte
    assert(GSnappy.uncompress(lied, src.length).isEmpty)
    // copy before the start of output: tag copy-1 at offset 1 with
    // nothing written yet
    assert(GSnappy.uncompress(Array[Byte](4, 1.toByte, 1), 4).isEmpty)
    // offset zero is invalid by spec: literal 'x' then copy-1 off 0
    assert(GSnappy.uncompress(Array[Byte](8, 0, 'x', 1, 0), 8).isEmpty)
    // literal runs past the input
    assert(GSnappy.uncompress(Array[Byte](10, (9 << 2).toByte, 'a'),
      10).isEmpty)
    // trailing garbage after a complete stream
    assert(GSnappy.uncompress(comp ++ Array[Byte](0, 0, 0),
      src.length).isEmpty)
    // empty input entirely
    assert(GSnappy.uncompress(Array.emptyByteArray, 1).isEmpty)
    assert(GSnappy.uncompress(Array.emptyByteArray, 0).isEmpty)
  }

  test("forged 4-byte literal length near Int.MaxValue refuses (Long " +
    "bounds, no wrap past the check into arraycopy)") {
    // preamble want=100; 1-byte literal 'a' puts o=1; then tag 0xFC =
    // literal with 4 trailing LE length bytes, 0x7FFFFFFE -> n =
    // Int.MaxValue, where BOTH `p + n` and `o + n` wrap negative under
    // Int arithmetic and would sail past the checks into arraycopy
    val forged = Array[Byte](100, 0, 'a', 0xfc.toByte, 0xfe.toByte,
      0xff.toByte, 0xff.toByte, 0x7f, 'x')
    assert(GSnappy.uncompress(forged, 100).isEmpty) // must not throw
  }

  test("compress: REAL LZ77 output round-trips through snappy-java " +
    "(the conformance pin) AND the engine's own decoder, on text, " +
    "random, repetitive, and every length 0..300; repetitive input " +
    "actually compresses") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray,
        "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"),
        ("lorem ipsum dolor sit amet " * 200).getBytes("UTF-8"),
        Array.fill(100000)(7.toByte),
        Array.fill(65539)(9.toByte), // literal > 64 KiB chunking
        {  val a = new Array[Byte](50000); rnd.nextBytes(a); a }) ++
        (0 to 300).map { n =>
          val a = new Array[Byte](n)
          // half-repetitive, half-random: exercises match+literal mix
          var i = 0
          while (i < n) {
            a(i) = if (i % 2 == 0) (i % 7).toByte else rnd.nextInt().toByte
            i += 1
          }
          a
        }
    for (c <- cases) {
      val z = graft.sources.Snappy.compress(c)
      // snappy-java is the conformance oracle
      val back = org.xerial.snappy.Snappy.uncompress(z)
      assert(java.util.Arrays.equals(back, c),
        s"snappy-java round-trip, n=${c.length}")
      // and the engine's own decoder agrees
      val own = graft.sources.Snappy.uncompress(z, c.length)
        .getOrElse(fail(s"own decode, n=${c.length}"))
      assert(java.util.Arrays.equals(own, c))
    }
    // the compressor genuinely compresses repetitive data
    val rep = ("abcdefgh" * 10000).getBytes("UTF-8")
    assert(graft.sources.Snappy.compress(rep).length < rep.length / 10)
  }
}
