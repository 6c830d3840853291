package graft

import graft.sources.{Deflate, Gzip}

/** The own DEFLATE encoder's laws: stdlib Inflater (the canonical
  * RFC 1951 decoder) must reproduce every input byte-exact from the
  * engine's output; text must GENUINELY compress (the size law a
  * stored-block fallback fails); the gzip wrapper must decode through
  * both GZIPInputStream and the engine's own member walk.
  */
class DeflateSpec extends SparkSpec {

  private def inflateRaw(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        if (n == 0 && !inf.finished())
          fail("inflater stalled (truncated or invalid stream)")
        out.write(chunk, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  test("compressFixed: stdlib Inflater round-trips a battery of " +
    "inputs byte-exact") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array[Byte](7, 7, 7),
      "a".getBytes("UTF-8"),
      "abcabcabcabcabcabc".getBytes("UTF-8"),
      ("the quick brown fox jumps over the lazy dog. " * 100)
        .getBytes("UTF-8"),
      Array.fill[Byte](100000)(0),                  // max-length runs
      Array.tabulate[Byte](65536)(i => (i % 251).toByte), // long period
      Array.fill[Byte](5000)((rnd.nextInt(256) - 128).toByte), // random
      { // match distances straddling the 32 KiB window
        val unit = Array.tabulate[Byte](40000)(i => (i * 7 % 250).toByte)
        unit ++ unit
      },
      // every byte value, then a repeat (9-bit literal codes 144..255)
      Array.tabulate[Byte](512)(i => (i % 256).toByte))
    cases.zipWithIndex.foreach { case (in, k) =>
      val c = Deflate.compressFixed(in)
      assert(inflateRaw(c).toSeq == in.toSeq, s"case $k")
    }
  }

  test("compressFixed: the size law — repetitive text genuinely " +
    "compresses, far below stored") {
    val text = (0 until 2000).map(i =>
      s"doc-$i-" + ("x" * (i % 17))).mkString("\n").getBytes("UTF-8")
    val c = Deflate.compressFixed(text)
    assert(c.length < text.length / 2,
      s"own deflate too weak: ${c.length} vs ${text.length}")
    assert(inflateRaw(c).toSeq == text.toSeq)
  }

  test("writeMemberOwn: GZIPInputStream and the own member walk both " +
    "decode the engine's gzip, CRC verified") {
    val data = ("lorem ipsum dolor sit amet " * 500).getBytes("UTF-8")
    val m = Gzip.writeMemberOwn(data, name = Some("own.txt"))
    assert(m.length < data.length / 2)
    // stdlib decode
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(m))
    val got = gz.readAllBytes()
    assert(got.toSeq == data.toSeq)
    // own member walk: name, crc, payload
    val ms = Gzip.members(m)
    assert(ms.length == 1)
    assert(ms.head.name == "own.txt" && ms.head.crc_ok &&
      ms.head.data.toSeq == data.toSeq &&
      ms.head.member_len == m.length.toLong)
    // concatenated members stay walkable
    val two = m ++ Gzip.writeMemberOwn("second".getBytes("UTF-8"))
    val ms2 = Gzip.members(two)
    assert(ms2.length == 2 && ms2(1).crc_ok &&
      new String(ms2(1).data, "UTF-8") == "second")
  }

  test("ParquetWrite codec=2 (own gzip): parquet-mr and the own " +
    "reader both decode gzip pages, smaller than stored") {
    val W = graft.sources.ParquetWrite
    val P = graft.sources.Parquet
    val n = 2000
    val ids = (0 until n).map(_.toLong)
    val txts = ids.map(d => s"payload-$d-" + ("z" * (d % 23).toInt))
    val fields = Seq(
      W.Leaf("id", 0, 2),
      W.Leaf("txt", 0, 6, convertedType = 0))
    val data = Seq(
      W.LeafData(Array.fill(n)(0), null, longs = ids.toArray),
      W.LeafData(Array.fill(n)(0), null,
        bins = txts.map(_.getBytes("UTF-8")).toArray))
    val gz = W.writeFile(fields, data, codec = 2)
    val plain = W.writeFile(fields, data, codec = 0)
    assert(gz.length < plain.length, "gzip pages must beat stored")
    // own reader
    assert(P.columnLongs(gz, "id").map(_.toSeq).contains(ids))
    assert(P.columnStrings(gz, "txt").map(_.toSeq).contains(txts))
    // footer must say GZIP
    val fm = P.parseFooter(gz).getOrElse(fail("footer"))
    assert(fm.rowGroups.head.cols.forall(_.codec == 2))
    // parquet-mr (Spark) as the independent reader of own-gzip pages
    val dir = java.nio.file.Files.createTempDirectory("pqgz").toFile
    val p = new java.io.File(dir, "own_gzip.parquet")
    java.nio.file.Files.write(p.toPath, gz)
    val got = spark.read.parquet(p.getAbsolutePath)
      .selectExpr("count(*)", "sum(id)", "sum(length(txt))")
      .collect()(0)
    assert(got.getLong(0) == n && got.getLong(1) == ids.sum &&
      got.getLong(2) == txts.map(_.length.toLong).sum)
    p.delete(); dir.delete()
  }
}
