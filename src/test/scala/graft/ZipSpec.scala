package graft

import graft.sources.Zip

/** ZIP central-directory walk pinned both ways against java.util.zip —
  * the JDK's writer produces archives our walker must inventory
  * (DEFLATED entries, data descriptors, comments), and the q202
  * builder's hand-laid STORED bytes must open with the JDK's reader.
  */
class ZipSpec extends SparkSpec {

  private def jdkZip(entries: Seq[(String, Array[Byte], Boolean)],
                     comment: String = ""): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    if (comment.nonEmpty) zos.setComment(comment)
    entries.foreach { case (name, data, stored) =>
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipOutputStream.STORED)
        e.setSize(data.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(data)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("JDK-written archives inventory exactly: names, methods, sizes, " +
    "CRCs, and local-header pointers") {
    val data = Seq(
      ("word/document.xml", ("<doc>" + "x" * 500 + "</doc>").getBytes("UTF-8"), false),
      ("META-INF/container.xml", "abcabcabc".getBytes("UTF-8"), false),
      ("mimetype", "application/epub+zip".getBytes("UTF-8"), true))
    val bytes = jdkZip(data, comment = "crawl-archive")
    val got = Zip.parseCentralDirectory(7L, bytes)
    assert(got.length == 3)
    assert(got.map(_.entry_name) == data.map(_._1))
    // methods as the JDK chose them: DEFLATED (8) unless STORED forced
    assert(got.map(_.method) == Seq(8, 8, 0))
    // sizes and CRCs agree with the independent reader's view
    val zf = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    data.foreach { case (name, payload, _) =>
      val e = zf.getNextEntry
      assert(e.getName == name)
      val mine = got.find(_.entry_name == name).get
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      assert(mine.crc32 == crc.getValue, s"crc of $name")
      assert(mine.uncomp_size == payload.length.toLong)
    }
    // every local-header pointer verified during the walk (the parser
    // rejects directories pointing into garbage) — offsets ascend
    assert(got.map(_.lfh_offset) == got.map(_.lfh_offset).sorted)
    assert(got.head.lfh_offset == 0L)
  }

  test("q202-shaped hand-laid STORED archive opens with the JDK reader " +
    "and round-trips through our walker") {
    // build via the query's own path: run q202's builder on a tiny frame
    import spark.implicits._
    val payload = "0123456789abcdef0123456789abcdef" // 32 ASCII bytes
    val crc = { val c = new java.util.zip.CRC32()
      c.update(payload.getBytes("US-ASCII")); c.getValue }
    // hand-lay one STORED entry + comment, mirroring q202's layout
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val name = "doc.txt".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b)
    w(Array[Byte](0x50, 0x4b, 3, 4)); w(le16(20)); w(le16(0)); w(le16(0))
    w(le16(0)); w(le16(0)); w(le32(crc)); w(le32(32)); w(le32(32))
    w(le16(name.length)); w(le16(0)); w(name)
    w(payload.getBytes("US-ASCII"))
    val cdOff = bos.size()
    w(Array[Byte](0x50, 0x4b, 1, 2)); w(le16(20)); w(le16(20)); w(le16(0))
    w(le16(0)); w(le16(0)); w(le16(0)); w(le32(crc)); w(le32(32)); w(le32(32))
    w(le16(name.length)); w(le16(0)); w(le16(0)); w(le16(0)); w(le16(0))
    w(le32(0)); w(le32(0)); w(name)
    val cdSize = bos.size() - cdOff
    w(Array[Byte](0x50, 0x4b, 5, 6)); w(le16(0)); w(le16(0)); w(le16(1))
    w(le16(1)); w(le32(cdSize.toLong)); w(le32(cdOff.toLong)); w(le16(4))
    w("cccc".getBytes("US-ASCII"))
    val bytes = bos.toByteArray
    // direction 1: the JDK reads our bytes
    val zf = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val e = zf.getNextEntry
    assert(e != null && e.getName == "doc.txt")
    val buf = new Array[Byte](64)
    val n = zf.read(buf)
    assert(new String(buf, 0, n, "US-ASCII") == payload)
    // direction 2: our walker (backward EOCD scan through the comment)
    val got = Zip.parseCentralDirectory(1L, bytes)
    assert(got == Seq(Zip.ZipEntry(1L, "doc.txt", 0, crc, 32L, 32L, 0L)))
    // distributed wrapper preserves rows
    val ds = spark.createDataset(Seq(Zip.ZipBlob(1L, bytes),
      Zip.ZipBlob(2L, bytes))).repartition(2)
    assert(Zip.entries(ds).collect().map(_.blob_id).sorted.toSeq == Seq(1L, 2L))
  }

  test("ZIP64 via the JDK writer: >65,535 entries trip the EOCD escapes " +
    "and the walk follows locator → EOCD64 to the full inventory") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val crc0 = new java.util.zip.CRC32().getValue // empty payload
    val n = 65600 // past the 16-bit count: JDK emits ZIP64 records
    for (i <- 0 until n) {
      val e = new java.util.zip.ZipEntry(f"e$i%05d")
      e.setMethod(java.util.zip.ZipOutputStream.STORED)
      e.setSize(0L); e.setCrc(crc0)
      zos.putNextEntry(e); zos.closeEntry()
    }
    zos.close()
    val bytes = bos.toByteArray
    val got = Zip.parseCentralDirectory(8L, bytes)
    assert(got.length == n, s"must see all $n entries, got ${got.length}")
    assert(got.head.entry_name == "e00000" && got.last.entry_name == f"e${n - 1}%05d")
    assert(got.map(_.lfh_offset) == got.map(_.lfh_offset).sorted)
  }

  /** Hand-laid two-entry STORED blob exercising EVERY ZIP64 escape with
    * small payloads: per-entry 0x0001 extras carry the real sizes and
    * local-header offsets behind 0xFFFFFFFF, and the EOCD's count/size/
    * offset are all escaped through locator + EOCD64. Mirrors q220's
    * layout (fixed offsets: CD at 140, size 164, EOCD64 at 304,
    * locator at 360, EOCD at 380).
    */
  private def zip64Blob(payloadDoc: Array[Byte], payloadMeta: Array[Byte],
                        comment: Array[Byte]): Array[Byte] = {
    require(payloadDoc.length == 32 && payloadMeta.length == 32)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le64(v: Long) = le32(v & 0xffffffffL) ++ le32(v >>> 32)
    def crcOf(d: Array[Byte]) = {
      val c = new java.util.zip.CRC32(); c.update(d); c.getValue
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b)
    def lfh(name: String, data: Array[Byte]): Unit = {
      w(Array[Byte](0x50, 0x4b, 3, 4)); w(le16(45)); w(le16(0)); w(le16(0))
      w(le16(0)); w(le16(0)); w(le32(crcOf(data)))
      w(le32(data.length.toLong)); w(le32(data.length.toLong))
      w(le16(name.length)); w(le16(0)); w(name.getBytes("US-ASCII")); w(data)
    }
    def cdh(name: String, data: Array[Byte], off: Long): Unit = {
      w(Array[Byte](0x50, 0x4b, 1, 2)); w(le16(45)); w(le16(45)); w(le16(0))
      w(le16(0)); w(le16(0)); w(le16(0)); w(le32(crcOf(data)))
      w(le32(0xffffffffL)); w(le32(0xffffffffL)) // comp/uncomp escaped
      w(le16(name.length)); w(le16(28)); w(le16(0)); w(le16(0)); w(le16(0))
      w(le32(0)); w(le32(0xffffffffL)) // lfh offset escaped
      w(name.getBytes("US-ASCII"))
      w(le16(1)); w(le16(24)) // ZIP64 extra: id 0x0001, 3 × 8 bytes
      w(le64(data.length.toLong)) // uncompressed (escape order)
      w(le64(data.length.toLong)) // compressed
      w(le64(off)) // local-header offset
    }
    lfh("doc.txt", payloadDoc) // ends at 69
    lfh("meta.json", payloadMeta) // ends at 140
    val cdOff = bos.size()
    cdh("doc.txt", payloadDoc, 0L)
    cdh("meta.json", payloadMeta, 69L)
    val cdSize = bos.size() - cdOff
    val e64At = bos.size()
    w(Array[Byte](0x50, 0x4b, 6, 6)); w(le64(44)) // EOCD64, 44 bytes follow
    w(le16(45)); w(le16(45)); w(le32(0)); w(le32(0))
    w(le64(2)); w(le64(2)); w(le64(cdSize.toLong)); w(le64(cdOff.toLong))
    w(Array[Byte](0x50, 0x4b, 6, 7)) // locator
    w(le32(0)); w(le64(e64At.toLong)); w(le32(1))
    w(Array[Byte](0x50, 0x4b, 5, 6)) // EOCD, everything escaped
    w(le16(0)); w(le16(0)); w(le16(0xffff)); w(le16(0xffff))
    w(le32(0xffffffffL)); w(le32(0xffffffffL))
    w(le16(comment.length)); w(comment)
    bos.toByteArray
  }

  test("ZIP64 per-entry escapes: sizes and offsets resolve through the " +
    "0x0001 extra, the JDK reader agrees, and damage fails closed") {
    val pd = "0123456789abcdef0123456789abcdef".getBytes("US-ASCII")
    val pm = "fedcba9876543210fedcba9876543210".getBytes("US-ASCII")
    val bytes = zip64Blob(pd, pm, "cc".getBytes("US-ASCII"))
    val got = Zip.parseCentralDirectory(9L, bytes)
    assert(got.map(e => (e.entry_name, e.comp_size, e.uncomp_size,
      e.lfh_offset)) == Seq(("doc.txt", 32L, 32L, 0L),
      ("meta.json", 32L, 32L, 69L)))
    // the JDK's streaming reader walks the same local headers
    val zf = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(zf.getNextEntry.getName == "doc.txt")
    assert(zf.getNextEntry.getName == "meta.json")
    // damage: EOCD escaped but the locator magic is gone → Nil
    val noLoc = bytes.clone()
    noLoc(360) = 'X'.toByte
    assert(Zip.parseCentralDirectory(10L, noLoc).isEmpty)
    // damage: per-entry escape present but the 0x0001 extra id flipped
    val noExtra = bytes.clone()
    noExtra(140 + 46 + 7) = 9 // entry 0's extra id 0x0001 → 0x0009
    assert(Zip.parseCentralDirectory(11L, noExtra).isEmpty)
    // damage: EOCD64 record magic corrupted → Nil
    val noE64 = bytes.clone()
    noE64(304 + 3) = 5
    assert(Zip.parseCentralDirectory(12L, noE64).isEmpty)
  }

  test("malformed archives yield an empty inventory, never a partial one") {
    val good = jdkZip(Seq(("a.txt", "hello".getBytes, false)))
    assert(Zip.parseCentralDirectory(1L, good).nonEmpty)
    // truncated EOCD
    assert(Zip.parseCentralDirectory(2L, good.take(good.length - 4)).isEmpty)
    // EOCD magic corrupted
    val noMagic = good.clone()
    val eocdAt = good.length - 22
    noMagic(eocdAt) = 'X'.toByte
    assert(Zip.parseCentralDirectory(3L, noMagic).isEmpty)
    // central-directory offset pointing past the EOCD
    val badOff = good.clone()
    badOff(eocdAt + 16) = 0xff.toByte; badOff(eocdAt + 17) = 0xff.toByte
    badOff(eocdAt + 18) = 0xff.toByte; badOff(eocdAt + 19) = 0x7f.toByte
    assert(Zip.parseCentralDirectory(4L, badOff).isEmpty)
    // a local-header pointer into garbage: flip entry 0's offset field
    val badPtr = good.clone()
    // find CDH magic and corrupt its offset field (+42)
    var cd = -1
    for (i <- 0 until badPtr.length - 4 if cd < 0)
      if (badPtr(i) == 0x50 && badPtr(i + 1) == 0x4b &&
        badPtr(i + 2) == 1 && badPtr(i + 3) == 2) cd = i
    badPtr(cd + 42) = 3
    assert(Zip.parseCentralDirectory(5L, badPtr).isEmpty)
    // garbage that merely contains the EOCD magic mid-stream
    val fake = ("junkPKjunkjunkjunkjunkjunkjunk" * 3).getBytes("ISO-8859-1")
    assert(Zip.parseCentralDirectory(6L, fake).isEmpty)
  }
}
