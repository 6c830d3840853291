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
