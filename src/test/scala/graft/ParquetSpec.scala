package graft

import graft.sources.Parquet

/** Byte-level parquet walk, pinned against TWO independent
  * implementations: parquet-cpp via the pyarrow-written fixture blobs
  * (fixtures/parquet_files.parquet + the metadata its C++ API claims),
  * and parquet-mr via files SPARK writes in this suite (footer compared
  * to ParquetFileReader, decoded sums compared to the source rows).
  */
class ParquetSpec extends SparkSpec {

  private def fixtureBlobs: Seq[(String, Array[Byte])] =
    spark.read.parquet("fixtures/parquet_files.parquet")
      .collect() // bounded: 18 fixture files
      .map(r => (r.getAs[String]("blob_key"), r.getAs[Array[Byte]]("file_bytes")))
      .toSeq

  test("pyarrow-written fixture files: footer walk reproduces every " +
    "metadata claim of the parquet-cpp API (offsets, sizes, codecs, " +
    "counts, created_by, trailer length)") {
    val want = spark.read.parquet("fixtures/parquet_meta_oracle.parquet")
      .collect() // bounded: 108 fixture rows
      .groupBy(_.getAs[String]("blob_key"))
    val blobs = fixtureBlobs
    assert(blobs.nonEmpty && want.nonEmpty)
    for ((key, bytes) <- blobs) {
      val fm = Parquet.parseFooter(bytes)
        .getOrElse(fail(s"fixture $key must parse"))
      val rows = want(key)
      assert(fm.version == 2 && fm.numLeaves == 3)
      assert(fm.footerLen == rows.head.getAs[Long]("footer_len"))
      assert(fm.createdBy == rows.head.getAs[String]("created_by"))
      assert(fm.numRows == rows.head.getAs[Long]("file_rows"))
      assert(fm.rowGroups.length == rows.head.getAs[Long]("n_row_groups"))
      for (r <- rows) {
        val c = fm.rowGroups(r.getAs[Long]("rg_idx").toInt)
          .cols(r.getAs[Long]("col_idx").toInt)
        assert(c.path == r.getAs[String]("col_path"))
        assert(c.physType == r.getAs[Long]("phys_type"))
        assert(c.codec == r.getAs[Long]("codec"))
        assert(c.numValues == r.getAs[Long]("num_values"))
        assert(c.dataPageOffset == r.getAs[Long]("data_page_offset"))
        assert(c.dictPageOffset == r.getAs[Long]("dict_page_offset"))
        assert(c.totalCompressed == r.getAs[Long]("total_compressed_size"))
        assert(c.totalUncompressed ==
          r.getAs[Long]("total_uncompressed_size"))
      }
      // pyarrow wrote the leaves REQUIRED: decode proves the offsets
      val levels = fm.leafLevels
      assert(levels.values.forall(_ == ((0, 0))))
      for (rg <- fm.rowGroups; c <- rg.cols) {
        val got = Parquet.decodeChunk(bytes, c, maxDef = 0)
          .getOrElse(fail(s"chunk ${c.path} must decode"))
        assert(got.numValues == c.numValues)
      }
    }
  }

  test("Spark-written files: footer agrees with parquet-mr's own reader " +
    "field by field, decoded sums equal the source rows (gzip and " +
    "uncompressed, required and nullable-with-nulls columns)") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import spark.implicits._
    for (codec <- Seq("gzip", "none")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"pq_spec_$codec").toString
      val df = spark.range(0, 300).select(
        $"id".as("rec_id"),
        org.apache.spark.sql.functions.when($"id" % 7 =!= 0,
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("doc-"), $"id")).as("payload"),
        ($"id" % 40 / 4.0).as("score"))
      df.coalesce(1).write
        .option("compression", codec)
        .option("parquet.enable.dictionary", "false")
        .mode("overwrite").parquet(dir)
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(file.toPath)
      val fm = Parquet.parseFooter(bytes).getOrElse(fail("must parse"))

      // parquet-mr reads the SAME bytes through its own thrift stack
      val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
        new HPath(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
      try {
        val mr = rdr.getFooter
        assert(fm.numRows == rdr.getRecordCount)
        assert(fm.createdBy == mr.getFileMetaData.getCreatedBy)
        assert(fm.rowGroups.length == mr.getBlocks.size())
        for (gi <- fm.rowGroups.indices) {
          val g = fm.rowGroups(gi)
          val mg = mr.getBlocks.get(gi)
          assert(g.numRows == mg.getRowCount)
          assert(g.cols.length == mg.getColumns.size())
          for (ci <- g.cols.indices) {
            val c = g.cols(ci)
            val mc = mg.getColumns.get(ci)
            assert(c.path == mc.getPath.toDotString)
            assert(c.numValues == mc.getValueCount)
            assert(c.totalCompressed == mc.getTotalSize)
            assert(c.totalUncompressed == mc.getTotalUncompressedSize)
            assert(c.dataPageOffset == mc.getFirstDataPageOffset)
            assert((c.codec == Parquet.CodecGzip) == (codec == "gzip"))
          }
        }
      } finally rdr.close()

      // decode: Spark wrote rec_id/score REQUIRED, payload OPTIONAL
      // with real nulls (id % 7 == 0) — both level paths exercised
      val levels = fm.leafLevels
      assert(levels("rec_id") == ((0, 0)) && levels("payload") == ((1, 0)))
      var idSum = 0L; var scoreSum = 0.0; var lenSum = 0L
      for (rg <- fm.rowGroups; c <- rg.cols) {
        val d = Parquet.decodeChunk(bytes, c, levels(c.path)._1)
          .getOrElse(fail(s"chunk ${c.path} must decode ($codec)"))
        assert(d.numValues == c.numValues)
        c.path match {
          case "rec_id" => idSum += d.longSum
          case "score" => scoreSum += d.doubleSum
          case "payload" => lenSum += d.binLenSum
        }
      }
      assert(idSum == (0L until 300L).sum)
      assert(scoreSum == (0 until 300).map(i => i % 40 / 4.0).sum)
      assert(lenSum == (0 until 300).filter(_ % 7 != 0)
        .map(i => s"doc-$i".length.toLong).sum)
    }
  }

  test("dictionary-encoded chunks route away from the PLAIN decoder " +
    "but the footer walk still reads them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_dict").toString
    spark.range(0, 200).select(($"id" % 5).cast("long").as("k"))
      .coalesce(1).write.option("compression", "gzip")
      .mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    val fm = Parquet.parseFooter(bytes).getOrElse(fail("must parse"))
    val c = fm.rowGroups.head.cols.head
    assert(c.dictPageOffset >= 0, "Spark defaults to dictionary encoding")
    assert(Parquet.decodeChunk(bytes, c, 0).isEmpty)
  }

  test("damage shapes fail closed: magic, trailer, forged lengths and " +
    "offsets, truncation, gzip size lies") {
    val bytes = fixtureBlobs.head._2
    assert(Parquet.parseFooter(bytes).isDefined)
    // not parquet / too short
    assert(Parquet.parseFooter("PAR1".getBytes).isEmpty)
    assert(Parquet.parseFooter("not a parquet file".getBytes).isEmpty)
    // flipped magic at either end
    val m0 = bytes.clone(); m0(0) = 'X'
    assert(Parquet.parseFooter(m0).isEmpty)
    val m1 = bytes.clone(); m1(bytes.length - 1) = 'X'
    assert(Parquet.parseFooter(m1).isEmpty)
    // forged trailer length: 0, > file, off by one (thrift walk must
    // land exactly at the trailer)
    def withLen(v: Int): Array[Byte] = {
      val c = bytes.clone()
      c(bytes.length - 8) = (v & 0xff).toByte
      c(bytes.length - 7) = ((v >> 8) & 0xff).toByte
      c(bytes.length - 6) = ((v >> 16) & 0xff).toByte
      c(bytes.length - 5) = ((v >> 24) & 0xff).toByte
      c
    }
    val realLen = (bytes(bytes.length - 8) & 0xff) |
      (bytes(bytes.length - 7) & 0xff) << 8 |
      (bytes(bytes.length - 6) & 0xff) << 16 |
      (bytes(bytes.length - 5) & 0xff) << 24
    assert(Parquet.parseFooter(withLen(0)).isEmpty)
    assert(Parquet.parseFooter(withLen(bytes.length)).isEmpty)
    assert(Parquet.parseFooter(withLen(realLen - 1)).isEmpty)
    assert(Parquet.parseFooter(withLen(realLen + 1)).isEmpty)
    // truncated mid-footer
    assert(Parquet.parseFooter(bytes.take(bytes.length - 20)).isEmpty)
    // forged chunk offsets: decode must fail closed, not misread
    val fm = Parquet.parseFooter(bytes).get
    val c = fm.rowGroups.head.cols.head
    assert(Parquet.decodeChunk(bytes, c.copy(dataPageOffset =
      bytes.length - 10L), 0).isEmpty)
    assert(Parquet.decodeChunk(bytes, c.copy(numValues =
      c.numValues + 1), 0).isEmpty)
    // gzip chunk whose page claims a wrong uncompressed size
    val gz = fixtureBlobs.map(_._2).find { b =>
      Parquet.parseFooter(b).exists(
        _.rowGroups.head.cols.head.codec == Parquet.CodecGzip)
    }.get
    val gfm = Parquet.parseFooter(gz).get
    val gc = gfm.rowGroups.head.cols.head
    assert(Parquet.decodeChunk(gz, gc, 0).isDefined)
    // corrupt the last page's gzip ISIZE trailer: the inflate must
    // notice (gunzipExact verifies the stream, not just the length)
    val bad = gz.clone()
    val tail = (gc.dataPageOffset + gc.totalCompressed - 2).toInt
    bad(tail) = (bad(tail) ^ 0x5a).toByte
    assert(Parquet.decodeChunk(bad, gc, 0).isEmpty)
    // corrupt the gzip HEADER (the 1f 8b magic right after the page
    // header): GZIPInputStream's CONSTRUCTOR throws here, so this pins
    // the construction-inside-try totality fix — None, not a crash
    val hdr = gz.clone()
    var gp = gc.dataPageOffset.toInt
    while (!(hdr(gp) == 0x1f.toByte && hdr(gp + 1) == 0x8b.toByte &&
      hdr(gp + 2) == 0x08.toByte)) gp += 1
    hdr(gp) = 0x00
    assert(Parquet.decodeChunk(hdr, gc, 0).isEmpty,
      "forged gzip header must damage to None, not throw")
    // and a forged compression-method byte (CM != 8): also thrown by
    // the constructor, before the read loop ever runs
    val cm = gz.clone()
    cm(gp + 2) = 0x07
    assert(Parquet.decodeChunk(cm, gc, 0).isEmpty)
  }

  test("a forged page header claiming 2^31-1 values must damage " +
    "BEFORE the definition-level array is allocated (adversarial " +
    "allocation bound, optional-column path)") {
    // hand-built thrift-compact v1 PageHeader: type=DATA_PAGE,
    // sizes tiny, num_values = Int.MaxValue, encoding = PLAIN
    def zz(v: Long): Array[Byte] = {
      var z = (v << 1) ^ (v >> 63)
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((z & ~0x7fL) != 0) { out += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
      out += z.toByte
      out.toArray
    }
    val payload = Array[Byte](2, 0, 0, 0, 3, 0) // LE32 len=2 + 2 RLE bytes
    val header =
      Array[Byte](0x15) ++ zz(0) ++ // 1: page_type DATA_PAGE
      Array[Byte](0x15) ++ zz(payload.length) ++ // 2: uncompressed
      Array[Byte](0x15) ++ zz(payload.length) ++ // 3: compressed
      Array[Byte](0x2c) ++ // 5: DataPageHeader (struct, delta 2)
        Array[Byte](0x15) ++ zz(Int.MaxValue) ++ // num_values
        Array[Byte](0x15) ++ zz(0) ++ // encoding PLAIN
        Array[Byte](0x15) ++ zz(3) ++ // def-level enc RLE
        Array[Byte](0x15) ++ zz(3) ++ // rep-level enc RLE
        Array[Byte](0) ++
      Array[Byte](0)
    val page = header ++ payload
    val col = Parquet.ColMeta(Parquet.PhysInt64, Seq(0), "x",
      Parquet.CodecNone, Int.MaxValue.toLong, page.length.toLong,
      page.length.toLong, 0L, -1L)
    // without the pre-allocation bound this is an 8 GB Array[Int]
    // request (OutOfMemoryError — an Error, not a Damage)
    assert(Parquet.decodeChunk(page, col, maxDef = 1).isEmpty)
  }
}
