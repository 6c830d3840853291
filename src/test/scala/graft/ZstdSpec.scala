package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{XxHash64, Zstd}

/** Stage-1 zstd frame walk, pinned against libzstd itself (zstd-jni —
  * the reference implementation, shipped by Spark) as the writer, and
  * the from-scratch XXH64 against lz4-java's independent xxhash.
  */
class ZstdSpec extends AnyFunSuite {

  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  test("XXH64 matches lz4-java's independent implementation on every " +
    "length class (empty, sub-4, sub-8, sub-32, stripes, tails) and " +
    "multiple seeds") {
    val factory = net.jpountz.xxhash.XXHashFactory.fastestInstance()
    for (seed <- Seq(0L, 1L, 0x9e3779b97f4a7c15L);
         n <- (0 to 40) ++ Seq(63, 64, 65, 100, 1000, 40000)) {
      val data = lcgBytes(n, n * 31 + seed)
      val theirs = factory.hash64().hash(data, 0, n, seed)
      assert(XxHash64.hash(data, seed) == theirs, s"n=$n seed=$seed")
    }
  }

  test("libzstd-written frames: RAW blocks on incompressible content " +
    "decode byte-for-byte with checksum verified; entropy-coded " +
    "blocks fully decode; multi-frame objects with skippable frames") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3).setChecksum(true)
    // incompressible: digest-chain bytes, the q243 content shape
    val rnd = lcgBytes(96, 7L)
    val zRaw = ctx.compress(rnd)
    val f = Zstd.walk(zRaw).getOrElse(fail("must walk")) match {
      case Seq(one) => one
      case other => fail(s"one frame expected, got ${other.length}")
    }
    assert(f.kind == "zstd" && f.declaredSize == 96)
    assert(f.compBlocks == 0 && f.rawBlocks >= 1,
      "libzstd must store incompressible content RAW")
    assert(f.checksumState == "ok")
    assert(java.util.Arrays.equals(f.decoded, rnd))

    // compressible: entropy-coded blocks now FULLY decode (stage 2)
    val text = ("the same phrase over and over " * 200).getBytes
    val zComp = ctx.compress(text)
    val g = Zstd.walk(zComp).get.head
    assert(g.declaredSize == text.length)
    assert(g.compBlocks >= 1, "this content must be entropy-coded")
    assert(java.util.Arrays.equals(g.decoded, text))
    assert(g.checksumState == "ok")

    // checksum off: state 'none'
    val ctx2 = new com.github.luben.zstd.ZstdCompressCtx()
    ctx2.setLevel(3).setChecksum(false)
    val zNoCk = ctx2.compress(rnd)
    assert(Zstd.walk(zNoCk).get.head.checksumState == "none")

    // multi-frame object: skippable + two zstd frames back to back
    val meta = "meta:42".getBytes
    val skip = Array[Byte](0x53, 0x2a, 0x4d, 0x18, // 0x184D2A53 LE
      (meta.length & 0xff).toByte, 0, 0, 0) ++ meta
    val obj = skip ++ zRaw ++ zNoCk
    val frames = Zstd.walk(obj).getOrElse(fail("multi-frame must walk"))
    assert(frames.length == 3)
    assert(frames(0).kind == "skip" &&
      new String(frames(0).decoded) == "meta:42")
    assert(frames(1).checksumState == "ok" &&
      java.util.Arrays.equals(frames(1).decoded, rnd))
    assert(frames(2).checksumState == "none")
  }

  test("hand-built RLE frame: our walk and libzstd's decoder agree on " +
    "the same bytes") {
    // magic | FHD(singleSegment, fcs 1 byte) | FCS=40 | block: last,
    // RLE, size 40 | value byte
    val h = (40L << 3) | (1L << 1) | 1L
    val frame = Array[Byte](0x28, (0xb5 & 0xff).toByte,
      (0x2f & 0xff).toByte, (0xfd & 0xff).toByte,
      0x20, 40, (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      ((h >> 16) & 0xff).toByte, 'x')
    val f = Zstd.walk(frame).getOrElse(fail("RLE frame must walk")).head
    assert(f.rleBlocks == 1 && f.declaredSize == 40)
    assert(new String(f.decoded) == "x" * 40)
    // libzstd agrees our hand-built frame is valid zstd
    val theirs = com.github.luben.zstd.Zstd.decompress(frame, 40)
    assert(new String(theirs) == "x" * 40)
  }

  test("stage 2 vs libzstd: every level and content class round-trips " +
    "byte-for-byte under the frame's own checksum — FSE tables, " +
    "4-stream Huffman, treeless repeats, multi-block windows, RLE " +
    "literals, predefined distributions") {
    // content classes chosen to force distinct entropy paths:
    def repeatText(n: Int) = ("lorem ipsum dolor sit amet " * n).getBytes
    def structured(n: Int) = (0 until n).map(i =>
      f"id=$i%06d,score=${i * 7 % 100}%02d;").mkString.getBytes
    def mixed(n: Int): Array[Byte] = {
      val r = lcgBytes(n, 5L)
      // sprinkle compressible islands into noise: partial matches
      val t = repeatText(4)
      var i = 0
      while (i + 200 < n) { System.arraycopy(t, 0, r, i, math.min(t.length, 100)); i += 400 }
      r
    }
    def runs(n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i / 700) % 7 + 'a').toByte)
    val shapes: Seq[(String, Array[Byte])] = Seq(
      ("tiny", "abc".getBytes),
      ("empty", Array.emptyByteArray),
      ("text-small", repeatText(10)),
      ("text-1block", repeatText(2000)),
      ("text-multiblock", repeatText(30000)), // > 128 KB: cross-block window
      ("structured", structured(20000)),
      ("mixed", mixed(300000)),
      ("runs", runs(400000)),
      ("noise-big", lcgBytes(200000, 13L)))
    for (level <- Seq(1, 3, 9, 19); (name, src) <- shapes) {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      ctx.setLevel(level).setChecksum(true)
      val z = ctx.compress(src)
      val fs = Zstd.walk(z)
        .getOrElse(fail(s"$name@$level must walk (${src.length} bytes)"))
      assert(fs.length == 1, s"$name@$level")
      val f = fs.head
      assert(f.declaredSize == src.length, s"$name@$level")
      assert(java.util.Arrays.equals(f.decoded, src),
        s"$name@$level decode mismatch")
      assert(f.checksumState == "ok", s"$name@$level")
    }
    // at least one of the matrix points must actually exercise
    // multi-block compressed frames (window matches across blocks)
    val big = repeatText(30000)
    val ctx9 = new com.github.luben.zstd.ZstdCompressCtx()
    ctx9.setLevel(9).setChecksum(true)
    val fBig = Zstd.walk(ctx9.compress(big)).get.head
    assert(fBig.nBlocks > 1 && fBig.compBlocks > 1,
      s"expected multi-block: $fBig")
  }

  test("stage 2 damage: flipped bytes anywhere in an entropy-coded " +
    "frame never throw — they yield None (or a checksum-caught " +
    "mismatch), across levels") {
    for (level <- Seq(1, 19)) {
      val src = ("payload " * 400).getBytes
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      ctx.setLevel(level).setChecksum(true)
      val z = ctx.compress(src)
      assert(Zstd.walk(z).isDefined)
      // flip EVERY byte position once: totality under arbitrary damage
      for (i <- z.indices) {
        val bad = z.clone()
        bad(i) = (bad(i) ^ 0x41).toByte
        val r = Zstd.walk(bad) // must not throw
        // with the checksum on, a flip that still walks must have
        // rewritten only the declared-size/flags in a way that keeps
        // content identical — anything else is caught
        r.foreach(fr => fr.filter(_.kind == "zstd").foreach(f =>
          assert(f.checksumState != "ok" ||
            java.util.Arrays.equals(f.decoded, src), s"level $level byte $i")))
      }
    }
  }

  test("damage fails closed: bad magic, reserved descriptor bit, " +
    "reserved block type, forged content size, flipped checksum, " +
    "truncation, trailing garbage") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3).setChecksum(true)
    val rnd = lcgBytes(64, 11L)
    val ok = ctx.compress(rnd)
    assert(Zstd.walk(ok).isDefined)
    // bad magic
    val m = ok.clone(); m(0) = 0x29
    assert(Zstd.walk(m).isEmpty)
    // reserved descriptor bit (bit 3)
    val r = ok.clone(); r(4) = (r(4) | 0x08).toByte
    assert(Zstd.walk(r).isEmpty)
    // flipped checksum tail byte (content fully decoded -> must verify)
    val c = ok.clone()
    c(c.length - 1) = (c(c.length - 1) ^ 0x5a).toByte
    assert(Zstd.walk(c).isEmpty)
    // flipped RAW payload byte: checksum must catch it
    val pl = ok.clone()
    pl(ok.length - 10) = (pl(ok.length - 10) ^ 0x5a).toByte
    assert(Zstd.walk(pl).isEmpty)
    // truncation anywhere inside the single frame
    for (k <- 1 until ok.length)
      assert(Zstd.walk(java.util.Arrays.copyOf(ok, k)).isEmpty, s"len $k")
    // trailing garbage after a valid frame
    assert(Zstd.walk(ok ++ Array[Byte](1, 2, 3)).isEmpty)
    // reserved block type in a hand frame
    val h3 = (4L << 3) | (3L << 1) | 1L
    val bad = Array[Byte](0x28, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte,
      0x20, 4, (h3 & 0xff).toByte, ((h3 >> 8) & 0xff).toByte,
      ((h3 >> 16) & 0xff).toByte, 1, 2, 3, 4)
    assert(Zstd.walk(bad).isEmpty)
    // forged FCS: hand RLE frame claiming 41 but decoding 40
    val h4 = (40L << 3) | (1L << 1) | 1L
    val lie = Array[Byte](0x28, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte,
      0x20, 41, (h4 & 0xff).toByte, ((h4 >> 8) & 0xff).toByte,
      ((h4 >> 16) & 0xff).toByte, 'x')
    assert(Zstd.walk(lie).isEmpty)
    // empty input is not a .zst object
    assert(Zstd.walk(Array.emptyByteArray).isEmpty)
  }

  test("a frame naming a dictionary refuses: RFC 8878 requires erroring " +
    "on an unknown dictionary, not silently decoding wrong bytes") {
    // singleSegment + dictIdFlag=1, 1-byte dict id 7, FCS 1, one RAW
    // block of 'x' — byte-valid except for the dictionary claim
    val h = (1L << 3) | (0L << 1) | 1L
    val withDict = Array[Byte](0x28, 0xb5.toByte, 0x2f.toByte,
      0xfd.toByte, 0x21, 7, 1, (h & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, ((h >> 16) & 0xff).toByte, 'x')
    assert(Zstd.walk(withDict).isEmpty)
    // the same frame WITHOUT the dict claim decodes — isolates the cause
    val noDict = Array[Byte](0x28, 0xb5.toByte, 0x2f.toByte,
      0xfd.toByte, 0x20, 1, (h & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, ((h >> 16) & 0xff).toByte, 'x')
    assert(Zstd.walk(noDict).exists(_.head.decoded.sameElements("x".getBytes)))
  }

  test("ENCODER vs libzstd: the own compressor's frames decode " +
    "byte-exact through zstd-jni AND the own decoder, across content " +
    "classes, boundary lengths, and multi-block inputs") {
    import graft.sources.ZstdEncode
    val rnd = new java.util.Random(0xc0ffee)
    def check(name: String, data: Array[Byte]): Int = {
      val z = ZstdEncode.compress(data)
      // determinism: same input, same bytes
      assert(java.util.Arrays.equals(z, ZstdEncode.compress(data)), name)
      // own decoder: one frame, verified checksum, exact content
      Zstd.walk(z) match {
        case Some(Seq(f)) =>
          assert(f.kind == "zstd" && f.checksumState == "ok" &&
            java.util.Arrays.equals(f.decoded, data), name)
        case other => fail(s"$name: $other")
      }
      // the reference implementation decodes the same bytes
      val theirs = com.github.luben.zstd.Zstd.decompress(z,
        math.max(1, data.length))
      assert(java.util.Arrays.equals(theirs, data), name)
      z.length
    }
    // content classes
    val text = (0 until 4000).map(d => "doc-" + d + "-" +
      ("x" * (d % 17)) + "\n").mkString.getBytes("UTF-8")
    val zText = check("text", text)
    // SIZE LAW: the entropy form genuinely compresses — a stored
    // fallback (or miscoded sequences forcing one) fails here
    assert(zText * 2 < text.length,
      s"text must beat half: $zText vs ${text.length}")
    val rep = ("abcdefgh" * 20000).getBytes
    assert(check("repetitive", rep) < 200)
    val rand = new Array[Byte](100000); rnd.nextBytes(rand)
    check("random", rand) // raw-block fallback path
    val mixed = new Array[Byte](150000) // random + a long zero plain
    rnd.nextBytes(mixed)
    java.util.Arrays.fill(mixed, 30000, 90000, 'z'.toByte)
    check("mixed", mixed)
    // >128-symbol alphabet: the direct-weights prefix form is
    // impossible — only the FSE-compressed weights path can carry
    // Huffman here, and it must still win on skewed content
    val hi = new Array[Byte](40000)
    var hk = 0
    while (hk < hi.length) {
      hi(hk) = (160 + (hk * 7 + hk / 13) % 16).toByte; hk += 1
    }
    assert(check("high-byte", hi) * 2 < hi.length,
      "FSE-weights Huffman must win on the >128-symbol alphabet")
    // boundary lengths incl. the 64 KiB block split and empty/tiny
    for (len <- Seq(0, 1, 2, 3, 4, 5, 31, 32, 33, 4095, 4096, 65535,
      65536, 65537, 131072, 131073)) {
      val d = new Array[Byte](len)
      var i = 0
      while (i < len) { d(i) = ((i * 31 + i / 7) % 11 + 'a').toByte
        i += 1 }
      check(s"len-$len", d)
    }
    // random structured sweeps: vary alphabet + run structure
    for (trial <- 0 until 40) {
      val len = 1 + rnd.nextInt(20000)
      val alpha = 1 + rnd.nextInt(8)
      val d = new Array[Byte](len)
      var i = 0
      while (i < len) {
        val run = 1 + rnd.nextInt(12)
        val b = ('a' + rnd.nextInt(alpha)).toByte
        var k = 0
        while (k < run && i < len) { d(i) = b; i += 1; k += 1 }
      }
      check(s"trial-$trial", d)
    }
  }

  test("ENCODER damage: flips anywhere in an own-written frame close " +
    "via structure or checksum — never wrong bytes out") {
    import graft.sources.ZstdEncode
    val data = (0 until 800).map(d => "line-" + d + " body " +
      ("y" * (d % 13)) + "\n").mkString.getBytes("UTF-8")
    val z = ZstdEncode.compress(data)
    for (i <- z.indices) {
      val bad = z.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      Zstd.walk(bad) match {
        case Some(Seq(f)) =>
          // survived the walk: the verified checksum forbids silent
          // wrong content
          assert(java.util.Arrays.equals(f.decoded, data),
            s"flip at $i decoded wrong bytes past a verified checksum")
        case _ => () // closed
      }
    }
  }
  test("PREFIX DICTIONARY: own compressWithDict round-trips through " +
    "own walkWithDict AND libzstd decompressUsingDict; libzstd's " +
    "dict-compressed frames decode through the own reader; size law; " +
    "wrong/missing dict fails closed") {
    val E = graft.sources.ZstdEncode
    val Z = graft.sources.Zstd
    // a corpus of small near-identical docs sharing boilerplate — the
    // dictionary's reason to exist
    val boiler = ("{'license': 'cc-by-4.0', 'pipeline': 'graft', " +
      "'source': 'commoncrawl', 'quality_gates': ['gopher', " +
      "'dedup', 'decontam'], 'tokenizer': 'bpe-64k', ").getBytes("UTF-8")
    val dict = (boiler ++ "'shard': 'part-00000'}".getBytes("UTF-8"))
    val docs = (0 until 40).map { i =>
      (new String(boiler, "UTF-8") +
        s"'doc_id': $i, 'lang': '${Seq("en", "es", "fr")(i % 3)}'}")
        .getBytes("UTF-8")
    }
    var withDict = 0L
    var without = 0L
    for (doc <- docs) {
      val z = E.compressWithDict(doc, dict)
      val zPlain = E.compress(doc)
      withDict += z.length
      without += zPlain.length
      // own reader with the dict: byte-exact, checksum ok
      val fr = Z.walkWithDict(z, dict).getOrElse(fail("own walk"))
      assert(fr.length == 1 && fr.head.checksumState == "ok")
      assert(java.util.Arrays.equals(fr.head.decoded, doc))
      // libzstd decodes the same frame with the same raw dict
      val dst = new Array[Byte](doc.length)
      val got = com.github.luben.zstd.Zstd.decompressUsingDict(
        dst, 0, z, 0, z.length, dict)
      assert(got == doc.length.toLong &&
        java.util.Arrays.equals(dst, doc))
      // missing dict: matches reach before the frame -> fails closed
      assert(Z.walk(z).isEmpty)
      // wrong dict: the checksum law catches silent wrong bytes
      val wrong = dict.clone()
      wrong(10) = (wrong(10) ^ 0x5a).toByte
      Z.walkWithDict(z, wrong) // None or checksum-failed, never throw
      assert(!Z.walkWithDict(z, wrong).exists(f =>
        java.util.Arrays.equals(f.head.decoded, doc) &&
          f.head.checksumState == "ok") ||
        java.util.Arrays.equals(wrong, dict))
    }
    // the dictionary must actually pay on boilerplate-heavy docs
    assert(withDict < without * 2 / 3, s"$withDict vs $without")
    // the REVERSE pin: libzstd compresses with the same raw dict,
    // the own reader decodes it
    for (level <- Seq(1, 3, 9); doc <- docs.take(5)) {
      val dst = new Array[Byte](doc.length * 2 + 128)
      val n = com.github.luben.zstd.Zstd.compressUsingDict(
        dst, 0, doc, 0, dict, level)
      val frame = java.util.Arrays.copyOf(dst, n.toInt)
      val fr = Z.walkWithDict(frame, dict)
        .getOrElse(fail(s"own walk of libzstd level $level"))
      assert(fr.length == 1 &&
        java.util.Arrays.equals(fr.head.decoded, doc),
        s"level $level")
    }
    // empty content under a dict still frames and round-trips
    val z0 = E.compressWithDict(Array.emptyByteArray, dict)
    assert(Z.walkWithDict(z0, dict)
      .exists(f => f.head.decoded.isEmpty))
  }
  test("trainDict: the trained dictionary beats no-dict AND a naive " +
    "same-size dictionary on HELD-OUT docs; deterministic; libzstd " +
    "accepts it as a raw dict") {
    val E = graft.sources.ZstdEncode
    val Z = graft.sources.Zstd
    def doc(i: Int): Array[Byte] =
      (s"<html><head><meta charset='utf-8'><title>page $i</title>" +
        s"<link rel='stylesheet' href='/static/site.css'></head>" +
        s"<body><nav class='top-navigation-bar'>home|docs|about</nav>" +
        s"<article data-id='$i'>unique words ${i * 7919} here" +
        s"</article><footer>copyright 2026 example corp</footer>" +
        "</body></html>").getBytes("UTF-8")
    val train = (0 until 50).map(doc)
    val heldOut = (100 until 130).map(doc)
    val dict = E.trainDict(train, maxSize = 2048)
    assert(dict.nonEmpty && dict.length <= 2048)
    // deterministic
    assert(java.util.Arrays.equals(dict,
      E.trainDict(train, maxSize = 2048)))
    val naive = Array.fill[Byte](dict.length)('x')
    var zT = 0L; var zN = 0L; var zP = 0L
    heldOut.foreach { d =>
      val t = E.compressWithDict(d, dict)
      // round-trip own + libzstd on the trained dict
      assert(Z.walkWithDict(t, dict).exists(fr =>
        java.util.Arrays.equals(fr.head.decoded, d)))
      val dst = new Array[Byte](d.length)
      assert(com.github.luben.zstd.Zstd.decompressUsingDict(
        dst, 0, t, 0, t.length, dict) == d.length.toLong &&
        java.util.Arrays.equals(dst, d))
      zT += t.length
      zN += E.compressWithDict(d, naive).length
      zP += E.compress(d).length
    }
    assert(zT < zP * 2 / 3, s"trained $zT vs plain $zP")
    assert(zT < zN, s"trained $zT vs naive $zN")
  }
  test("SEEKABLE format: own write -> table parse + frame-k random " +
    "access byte-exact; zstd-jni streams the whole file through the " +
    "skippable table; damage fails closed") {
    val K = graft.sources.ZstdSeekable
    val Z = graft.sources.Zstd
    val chunks = Seq(
      ("doc one: " + "alpha beta " * 400).getBytes("UTF-8"),
      new Array[Byte](50000), // zeros
      ("{'k': 'v'} " * 900).getBytes("UTF-8"),
      { val r = new java.util.Random(9); val a = new Array[Byte](30000)
        r.nextBytes(a); a }) // incompressible
    val b = K.write(chunks)
    val table = K.parse(b).getOrElse(fail("table"))
    assert(table.length == 4)
    assert(table.map(_.decompressedSize) ==
      chunks.map(_.length.toLong))
    // frame k alone — the parallel-scan unit
    for ((e, c) <- table.zip(chunks)) {
      val got = K.frame(b, e).getOrElse(fail(s"frame @${e.offset}"))
      assert(java.util.Arrays.equals(got, c))
    }
    // the own generic walk sees 4 zstd frames + 1 skippable
    val frames = Z.walk(b).getOrElse(fail("walk"))
    assert(frames.count(_.kind == "zstd") == 4 &&
      frames.count(_.kind == "skip") == 1)
    // zstd-jni (libzstd) streams the whole thing, skippable included
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(b)).setContinuous(true)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    assert(java.util.Arrays.equals(out.toByteArray,
      chunks.toArray.flatten))
    // damage: footer magic, descriptor reserved bits, size lies,
    // truncations — all None, never a throw
    val m = b.clone(); m(b.length - 1) = (m(b.length - 1) ^ 1).toByte
    assert(K.parse(m).isEmpty)
    val d = b.clone(); d(b.length - 5) = 0x04.toByte
    assert(K.parse(d).isEmpty)
    for (cut <- 0 until b.length by 997)
      K.parse(java.util.Arrays.copyOf(b, cut))
    for (i <- b.indices by 53) {
      val bad = b.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      K.parse(bad).foreach(_.foreach(e => K.frame(bad, e)))
    }
    // empty-chunk-list edge: a zero-frame seekable parses to Nil
    val empty = K.write(Seq.empty)
    assert(K.parse(empty).exists(_.isEmpty))
  }

  test("STRUCTURED dictionaries (q395): libzstd's trained dict " +
    "parses (magic, id, entropy tables, reps); libzstd frames " +
    "NAMING it decode through walkWithDicts; own structured frames " +
    "decode through libzstd with the own-built dict; wrong or " +
    "absent dictionary fails CLOSED; measured size win") {
    val E = graft.sources.ZstdEncode
    val Z = graft.sources.Zstd
    def doc(i: Int): Array[Byte] =
      (s"{'license': 'cc-by-4.0', 'source': 'commoncrawl', " +
        s"'quality_gates': ['gopher', 'dedup', 'decontam'], " +
        s"'doc_id': $i, 'lang': '${Seq("en", "es", "fr")(i % 3)}', " +
        s"'text': 'sample content ${i * 7919} of shard $i'}")
        .getBytes("UTF-8")
    val docs = (0 until 400).map(doc)
    // DIRECTION 1: libzstd --train's output (ZDICT) -> our parser,
    // then libzstd compresses NAMING it -> our walkWithDicts decodes
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(
      1 << 22, 4096)
    docs.foreach(trainer.addSample)
    val theirDict = trainer.trainSamples()
    val parsed = Z.parseDictionary(theirDict)
      .getOrElse(fail("libzstd dict must parse"))
    assert(parsed.id != 0L && parsed.entropyStart == 8 &&
      parsed.contentStart > 8)
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    cctx.setLevel(3)
    cctx.loadDict(theirDict)
    for (d <- docs.take(25)) {
      val z = cctx.compress(d)
      val fr = Z.walkWithDicts(z, Seq(parsed))
        .getOrElse(fail("own walk of libzstd dict frame"))
      assert(fr.length == 1 &&
        java.util.Arrays.equals(fr.head.decoded, d))
      // the frame NAMES the dictionary; without it: fail CLOSED
      assert(Z.walk(z).isEmpty, "unnamed decode must refuse")
      assert(Z.walkWithDicts(z, Nil).isEmpty)
      // a DIFFERENT id does not resolve it
      assert(Z.walkWithDicts(z,
        Seq(parsed.copy(id = parsed.id + 1))).isEmpty)
    }
    // DIRECTION 2: own trainer -> own structured wrap -> own
    // encoder naming the id -> libzstd decodes with the same dict
    val ownContent = E.trainDict(docs, maxSize = 2048)
    val ownDict = E.buildDictionary(ownContent, id = 77L)
    val ownParsed = Z.parseDictionary(ownDict).getOrElse(fail("own"))
    assert(ownParsed.id == 77L)
    val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
    dctx.loadDict(ownDict)
    var withDict = 0L; var without = 0L
    for (d <- docs) {
      val z = E.compressWithStructuredDict(d, ownParsed)
      withDict += z.length
      without += E.compress(d).length
      assert(java.util.Arrays.equals(dctx.decompress(z, d.length), d),
        "libzstd must decode own structured-dict frames")
      val fr = Z.walkWithDicts(z, Seq(ownParsed)).getOrElse(fail("rt"))
      assert(fr.length == 1 && fr.head.checksumState == "ok" &&
        java.util.Arrays.equals(fr.head.decoded, d))
      assert(Z.walk(z).isEmpty)
    }
    assert(withDict < without, s"size win: $withDict vs $without")
    // dictionary totality: truncated / id-0 / bad-rep dicts refuse
    assert(Z.parseDictionary(theirDict.take(10)).isEmpty)
    assert(Z.parseDictionary(Array.emptyByteArray).isEmpty)
    val idZero = ownDict.clone()
    idZero(4) = 0; idZero(5) = 0; idZero(6) = 0; idZero(7) = 0
    assert(Z.parseDictionary(idZero).isEmpty,
      "a structured dict must be nameable")
    // raw-content bytes still parse as a raw dict (id 0)
    assert(Z.parseDictionary(ownContent).exists(_.id == 0L))
  }

  test("seekable x dictionary (q406): the table parses dict-free, " +
    "frame-k random access needs the named dictionary, libzstd " +
    "decodes the sliced frames with the same dict") {
    val E = graft.sources.ZstdEncode
    val Z = graft.sources.Zstd
    val K = graft.sources.ZstdSeekable
    def doc(i: Int): Array[Byte] =
      (s"{'license': 'cc-by-4.0', 'source': 'commoncrawl', " +
        s"'doc_id': $i, 'text': 'shared boilerplate ${i * 31}'}")
        .getBytes("UTF-8")
    val docs = (0 until 40).map(doc)
    val dict = Z.parseDictionary(
      E.buildDictionary(E.trainDict(docs, maxSize = 2048),
        id = 9L)).get
    val b = K.writeWithDict(docs, dict)
    val entries = K.parse(b).getOrElse(fail("table, dict-free"))
    assert(entries.length == docs.length)
    val dctx = new com.github.luben.zstd.ZstdDecompressCtx()
    dctx.loadDict(dict.bytes)
    entries.zip(docs).foreach { case (e, d) =>
      assert(K.frameWithDicts(b, e, Seq(dict))
        .exists(java.util.Arrays.equals(_, d)))
      assert(K.frame(b, e).isEmpty, "content is dict-gated")
      assert(K.frameWithDicts(b, e,
        Seq(dict.copy(id = 10L))).isEmpty)
      // libzstd decodes the same sliced frame bytes
      val sl = java.util.Arrays.copyOfRange(b, e.offset.toInt,
        (e.offset + e.compressedSize).toInt)
      assert(java.util.Arrays.equals(
        dctx.decompress(sl, d.length), d))
    }
    assert(b.length < K.write(docs).length, "the win composes")
  }
}



