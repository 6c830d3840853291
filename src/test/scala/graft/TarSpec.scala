package graft

import graft.sources.Tar

/** ustar walk pinned against an INDEPENDENT writer: fixtures/golden.tar
  * is produced by CPython's stdlib tarfile (scripts/make_tar_fixture.py
  * — the sandbox JDK ships no tar), with the shapes that exercise the
  * walker: a directory entry, a zero-byte file, padded and
  * exactly-one-block payloads, and a >100-char path split across the
  * ustar prefix field. The engine's own writer round-trips through the
  * parser, and malformations fail closed.
  */
class TarSpec extends SparkSpec {

  private lazy val golden =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/golden.tar"))

  test("CPython-tarfile archive inventories exactly: names (incl. the " +
    "prefix-field split), sizes, types, mtimes, data offsets") {
    val got = Tar.parse(1L, golden)
    val longName = (Seq.fill(22)("deep") :+ "leaf.txt").mkString("/")
    assert(got.map(e => (e.entry_name, e.size, e.type_flag, e.mtime,
      e.data_offset)) == Seq(
      ("corpus/", 0L, "5", 1700000000L, 512L),
      ("corpus/empty.txt", 0L, "0", 1700000001L, 1024L),
      ("corpus/doc.txt", 48L, "0", 1700000002L, 1536L),
      ("corpus/block.bin", 512L, "0", 1700000003L, 2560L),
      (longName, 22L, "0", 1700000004L, 3584L)))
    // payload readback via the reported offsets: the stride is real
    val doc = got.find(_.entry_name == "corpus/doc.txt").get
    assert(new String(golden, doc.data_offset.toInt, doc.size.toInt,
      "US-ASCII") == "hello tar world\n" * 3)
  }

  test("own writer round-trips through the walker; distributed wrapper " +
    "preserves rows") {
    val entries = Seq(
      ("a.txt", "first payload".getBytes("UTF-8"), 1700000100L),
      ("b.bin", Array.tabulate[Byte](700)(_.toByte), 1700000200L),
      ("c.txt", Array.emptyByteArray, 1700000300L))
    val bytes = Tar.write(entries)
    val got = Tar.parse(9L, bytes)
    assert(got.map(e => (e.entry_name, e.size, e.mtime)) ==
      entries.map(e => (e._1, e._2.length.toLong, e._3)))
    // payloads land where the offsets say
    entries.zip(got).foreach { case ((_, data, _), e) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, e.data_offset.toInt,
          e.data_offset.toInt + e.size.toInt), data))
    }
    import spark.implicits.newProductEncoder
    val ds = spark.createDataset(Seq(Tar.TarBlob(1L, bytes),
      Tar.TarBlob(2L, golden)))(newProductEncoder)
    assert(Tar.entries(ds).collect().groupBy(_.blob_id)
      .view.mapValues(_.length).toMap == Map(1L -> 3, 2L -> 5))
  }

  test("malformed archives yield an empty inventory, never a partial one") {
    val good = Tar.write(Seq(("x.txt", "payload".getBytes, 1L)))
    assert(Tar.parse(1L, good).nonEmpty)
    // checksum corrupted (flip a name byte after the checksum was set)
    val bad = good.clone(); bad(0) = 'y'
    assert(Tar.parse(2L, bad).isEmpty)
    // truncated before the double-zero terminator
    assert(Tar.parse(3L, good.take(good.length - 1024)).isEmpty)
    // a corrupted SIZE field cannot mis-stride the walk: the header
    // checksum guard rejects the block before the size is trusted
    val overrun = good.clone()
    overrun(124) = '7'; overrun(125) = '7'; overrun(126) = '7'
    assert(Tar.parse(4L, overrun).isEmpty)
    val nonOctal = good.clone(); nonOctal(124) = '9'
    assert(Tar.parse(5L, nonOctal).isEmpty)
    // garbage that is not 512-aligned ustar at all
    assert(Tar.parse(6L, "just some text".getBytes).isEmpty)
  }

  private lazy val goldenPax =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/golden_pax.tar"))

  private lazy val goldenGnu =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/golden_gnu.tar"))

  test("PAX archive (CPython tarfile's default format): 'x' metadata " +
    "blocks apply path overrides to the entries they govern and never " +
    "surface as data rows") {
    val got = Tar.parse(11L, goldenPax)
    val shard = "corpus/shard-" + "x" * 120 + ".jsonl"
    assert(got.map(e => (e.entry_name, e.size, e.type_flag, e.mtime,
      e.data_offset)) == Seq(
      ("corpus/short.txt", 12L, "0", 1700000100L, 512L),
      (shard, 88L, "0", 1700000101L, 2560L),
      ("corpus/after.txt", 23L, "0", 1700000102L, 3584L), // no leak
      ("corpus/naïve-ñame.txt", 10L, "0", 1700000103L, 5632L)))
    // payload readback via the reported offsets: strides over the
    // metadata blocks are real
    val s = got(1)
    assert(new String(goldenPax, s.data_offset.toInt, s.size.toInt,
      "US-ASCII") == "long-basename payload\n" * 4)
  }

  test("GNU long-name archive: 'L' entries rename the next entry and " +
    "never surface as data rows") {
    val got = Tar.parse(12L, goldenGnu)
    val long = "g/" + "y" * 140 + "/tail.bin"
    assert(got.map(e => (e.entry_name, e.size, e.mtime, e.data_offset)) ==
      Seq(("a.txt", 6L, 1700000200L, 512L),
        (long, 21L, 1700000201L, 2560L),
        ("z.txt", 6L, 1700000202L, 3584L)))
    val l = got(1)
    assert(new String(goldenGnu, l.data_offset.toInt, l.size.toInt,
      "US-ASCII") == "gnu long-link payload")
  }

  test("own writer emits PAX x-headers for >100-byte names and " +
    "round-trips through the walker at the computed offsets") {
    val long = "nested/" + "a" * 120 + ".jsonl"
    val bytes = Tar.write(Seq((long, "payload".getBytes, 5L),
      ("s.txt", "x".getBytes, 6L)))
    val got = Tar.parse(15L, bytes)
    // x header at 0, 1-block record, entry header at 1024, data at 1536
    assert(got.map(e => (e.entry_name, e.size, e.mtime, e.data_offset)) ==
      Seq((long, 7L, 5L, 1536L), ("s.txt", 1L, 6L, 2560L)))
  }

  /** Raw 512-byte header with a correct checksum — for shapes the
    * engine's plain-file writer refuses to emit (metadata typeflags,
    * size-field/PAX disagreements).
    */
  private def rawHeader(name: String, sizeField: Long, mtime: Long,
                        typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val p = ("0" * (len - 1 - s.length)) + s
      for (i <- 0 until len - 1) h(off + i) = p.charAt(i).toByte
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
    oct(sizeField, 124, 12); oct(mtime, 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = typeflag.toByte
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    var sum = 0L
    for (i <- 0 until 512) sum += h(i) & 0xff
    oct(sum, 148, 7); h(155) = ' '
    h
  }

  test("a PAX size override drives BOTH the reported size and the " +
    "stride (the >8GiB-member mechanism), and a malformed PAX record " +
    "fails the whole walk closed") {
    def pad(d: Array[Byte]) = d ++ new Array[Byte]((512 - d.length % 512) % 512)
    val rec = "12 size=600\n" // the length prefix counts itself
    require(rec.length == 12)
    val payload = Array.tabulate[Byte](600)(_.toByte)
    val tail = Tar.write(Seq(("after.txt", "post".getBytes, 9L)))
    val blob =
      rawHeader("PaxHeaders.0/big.bin", rec.length.toLong, 1L, 'x') ++
        pad(rec.getBytes("US-ASCII")) ++
        rawHeader("big.bin", 0L, 2L, '0') ++ // header FIELD says zero
        pad(payload) ++ tail
    val got = Tar.parse(13L, blob)
    // size comes from the override; after.txt is only reachable if the
    // stride ALSO used the override (a 0-size stride would desync)
    assert(got.map(e => (e.entry_name, e.size)) ==
      Seq(("big.bin", 600L), ("after.txt", 4L)))
    // malformed record (length prefix lies) → Nil, not a partial walk
    val bad = "7 size=600\n"
    val blob2 =
      rawHeader("PaxHeaders.0/big.bin", bad.length.toLong, 1L, 'x') ++
        pad(bad.getBytes("US-ASCII")) ++
        rawHeader("big.bin", 0L, 2L, '0') ++ pad(payload) ++ tail
    assert(Tar.parse(14L, blob2).isEmpty)
  }

  test("a forged near-4GiB size with a VALID checksum fails closed " +
    "(Int stride arithmetic would stall the walk forever)") {
    val good = Tar.write(Seq(("x.txt", "payload".getBytes, 1L)))
    val forged = good.clone()
    // size = 4294966784 = 0o37777777000: in Int arithmetic
    // dataBlocks*512 wraps to -512, so pos would never advance —
    // infinite loop on an attacker-supplied blob (the checksum is
    // trivially forgeable, so the checksum guard does NOT save us here)
    val oct = "37777777000"
    for (i <- 0 until oct.length) forged(124 + i) = oct.charAt(i).toByte
    forged(135) = 0
    var sum = 0L
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toInt else forged(i) & 0xff)
    val ck = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - ck.length)) + ck
    for (i <- 0 until 6) forged(148 + i) = padded.charAt(i).toByte
    forged(154) = 0; forged(155) = ' '
    assert(Tar.parse(7L, forged).isEmpty)
  }
}
