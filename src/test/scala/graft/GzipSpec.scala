package graft

import graft.sources.Gzip

/** RFC 1952 member walk pinned against the JDK's own gzip codec in BOTH
  * directions — GZIPInputStream must read our writer's members, and our
  * walk must stride GZIPOutputStream's members — so neither side is
  * validated by itself. Damage shapes (flipped trailer CRC, truncated
  * tail member) must be OBSERVABLE, not silently vanished: the curation
  * lesson from q200.
  */
class GzipSpec extends SparkSpec {

  private def jdkGunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("writer's members decode via the INDEPENDENT JDK GZIPInputStream, " +
    "and the walk recovers names, boundaries, and bytes") {
    val parts = Seq("first record\n", "second, longer record " * 9, "")
      .map(_.getBytes("US-ASCII"))
    val blob = parts.zipWithIndex.map { case (p, i) =>
      Gzip.writeMember(p, Some(s"part-$i"))
    }.reduce(_ ++ _)

    // independent read of the whole concatenation
    assert(jdkGunzipAll(blob).toSeq == parts.reduce(_ ++ _).toSeq)

    val ms = Gzip.members(blob)
    assert(ms.map(_.name) == Seq("part-0", "part-1", "part-2"))
    assert(ms.forall(_.crc_ok))
    assert(ms.map(_.data.toSeq) == parts.map(_.toSeq))
    // the stride IS the contract: offsets chain exactly, ending at EOF
    assert(ms.head.offset == 0L)
    ms.sliding(2).foreach { case Seq(a, b) =>
      assert(b.offset == a.offset + a.member_len)
    }
    assert(ms.last.offset + ms.last.member_len == blob.length)
  }

  test("JDK GZIPOutputStream members (no FNAME, OS/XFL set by the JDK) " +
    "walk correctly — the reader is not specialized to our own writer") {
    def jdkMember(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("US-ASCII")); gz.close()
      bos.toByteArray
    }
    val blob = jdkMember("alpha") ++ jdkMember("beta beta")
    val ms = Gzip.members(blob)
    assert(ms.map(m => new String(m.data, "US-ASCII")) ==
      Seq("alpha", "beta beta"))
    assert(ms.forall(_.crc_ok) && ms.forall(_.name == ""))
    assert(ms.map(_.uncomp_len) == Seq(5L, 9L))
  }

  test("FEXTRA + FNAME + FCOMMENT + FHCRC header fields all stride " +
    "(hand-built member exercising every FLG bit at once)") {
    val payload = "full-flag member".getBytes("US-ASCII")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(payload); d.finish()
    val cbuf = new Array[Byte](1024)
    val clen = d.deflate(cbuf); d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, (2 | 4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0xff.toByte)) // FHCRC|FEXTRA|FNAME|FCOMMENT
    out.write(Array[Byte](3, 0, 1, 2, 3)) // FEXTRA: XLEN=3 + 3 bytes
    out.write("the-name".getBytes("US-ASCII")); out.write(0)
    out.write("a comment".getBytes("US-ASCII")); out.write(0)
    // FHCRC: RFC 1952 CRC16 = low 16 bits of CRC-32 over the header so
    // far — the walk VERIFIES it (round 9)
    val hdr = out.toByteArray
    val hcrc = new java.util.zip.CRC32; hcrc.update(hdr)
    out.write((hcrc.getValue & 0xff).toInt)
    out.write(((hcrc.getValue >> 8) & 0xff).toInt)
    out.write(cbuf, 0, clen)
    val crc = new java.util.zip.CRC32; crc.update(payload)
    val v = crc.getValue; val sz = payload.length.toLong
    Seq(v, sz).foreach { x =>
      (0 until 4).foreach(i => out.write(((x >> (8 * i)) & 0xff).toInt))
    }
    val blob = out.toByteArray
    val ms = Gzip.members(blob)
    assert(ms.size == 1 && ms.head.crc_ok && ms.head.name == "the-name")
    assert(new String(ms.head.data, "US-ASCII") == "full-flag member")
    // ...and the JDK agrees the member is well-formed (it verifies
    // FHCRC too), while a corrupted header CRC ends our walk
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(blob))
    val buf = new Array[Byte](64)
    assert(new String(buf, 0, gis.read(buf), "US-ASCII") == "full-flag member")
    val badHcrc = blob.clone()
    badHcrc(hdr.length) = (badHcrc(hdr.length) ^ 0x55).toByte
    assert(Gzip.members(badHcrc).isEmpty)
  }

  test("damage is observable, never vanished: a flipped trailer CRC " +
    "keeps the member with crc_ok=false; a truncated tail member keeps " +
    "everything before it") {
    val m1 = Gzip.writeMember("good one".getBytes, Some("g"))
    val m2 = Gzip.writeMember("bad crc".getBytes, Some("b"))
    val corrupted = m1 ++ {
      val c = m2.clone(); c(c.length - 5) = (c(c.length - 5) ^ 0x7f).toByte; c
    }
    val ms = Gzip.members(corrupted)
    assert(ms.map(_.crc_ok) == Seq(true, false))
    assert(new String(ms(1).data, "US-ASCII") == "bad crc") // bytes kept

    val truncated = m1 ++ m2.take(m2.length - 12) // cut mid-deflate/trailer
    val ts = Gzip.members(truncated)
    assert(ts.size == 1 && ts.head.crc_ok &&
      new String(ts.head.data, "US-ASCII") == "good one")
  }

  test("a member truncated inside FEXTRA ends the walk gracefully, " +
    "keeping earlier members (never an index past the buffer)") {
    val m1 = Gzip.writeMember("first".getBytes, Some("f"))
    // FLG says FEXTRA but the blob ends 1 byte into XLEN: reading the
    // 16-bit XLEN would index past the end
    val cutInXlen = m1 ++ Array[Byte](0x1f, 0x8b.toByte, 8, 4,
      0, 0, 0, 0, 0, 0xff.toByte, 5)
    val a = Gzip.members(cutInXlen)
    assert(a.size == 1 && a.head.crc_ok &&
      new String(a.head.data, "US-ASCII") == "first")
    // XLEN intact but declares extra bytes the blob doesn't have:
    // skipping anyway would proceed at a wrong (out-of-range) offset
    val cutInExtra = m1 ++ Array[Byte](0x1f, 0x8b.toByte, 8, 4,
      0, 0, 0, 0, 0, 0xff.toByte, 9, 0, 1, 2)
    val b = Gzip.members(cutInExtra)
    assert(b.size == 1 && b.head.crc_ok)
  }

  test("empty payload member round-trips (zero-length deflate stream, " +
    "ISIZE 0)") {
    val blob = Gzip.writeMember(Array.emptyByteArray, None)
    val ms = Gzip.members(blob)
    assert(ms.size == 1 && ms.head.crc_ok && ms.head.uncomp_len == 0L)
    assert(ms.head.member_len == blob.length.toLong)
  }
  test("BGZF: stride-without-inflate walk, virtual-offset fetch, " +
    "EOF-marker law, GZIPInputStream (the reference) decodes the " +
    "whole file; damage fails closed") {
    val B = graft.sources.Bgzf
    val text = (0 until 3000).map(i =>
      s"line $i of the bgzf corpus with filler ${i % 71}\n").mkString
    val data = text.getBytes("UTF-8")
    val b = B.write(data, blockSize = 4096)
    val bs = B.blocks(b).getOrElse(fail("blocks"))
    assert(bs.length == (data.length + 4095) / 4096)
    assert(bs.map(_.isize).sum == data.length.toLong)
    // members tile exactly up to the EOF marker
    assert(bs.head.coffset == 0L)
    assert(bs.zip(bs.drop(1)).forall { case (x, y) =>
      x.coffset + x.bsize == y.coffset })
    assert(bs.last.coffset + bs.last.bsize ==
      (b.length - B.EofMarker.length).toLong)
    // block k alone decodes to its slice
    for ((blk, k) <- bs.zipWithIndex) {
      val want = java.util.Arrays.copyOfRange(data, k * 4096,
        math.min(data.length, (k + 1) * 4096))
      assert(B.blockData(b, blk).exists(
        java.util.Arrays.equals(_, want)), s"block $k")
    }
    // virtual offsets: mid-block fetch spanning two blocks
    val blk1 = bs(1)
    val v = (blk1.coffset << 16) | 1000L
    val got = B.virtualFetch(b, v, 5000).getOrElse(fail("vfetch"))
    assert(java.util.Arrays.equals(got,
      java.util.Arrays.copyOfRange(data, 4096 + 1000, 4096 + 6000)))
    // the JDK's multi-member gzip reader decodes the whole file
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    assert(java.util.Arrays.equals(out.toByteArray, data))
    // EOF-marker law: a file cut before the marker is INCOMPLETE
    assert(B.blocks(java.util.Arrays.copyOf(b,
      b.length - B.EofMarker.length)).isEmpty)
    // truncation + flip battery never throws
    for (cut <- 0 until b.length by 503)
      B.blocks(java.util.Arrays.copyOf(b, cut))
    for (i <- b.indices by 97) {
      val bad = b.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      B.blocks(bad).foreach(_.foreach(e => B.blockData(bad, e)))
    }
    // empty input: just the EOF marker, zero blocks
    val empty = B.write(Array.emptyByteArray)
    assert(java.util.Arrays.equals(empty, B.EofMarker))
    assert(B.blocks(empty).exists(_.isEmpty))
  }
}

