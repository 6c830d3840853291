package graft.sources

/** A from-scratch MINIMAL parquet writer — the inverse of the
  * engine's byte-level reader: PAR1 magic, one row group, REQUIRED
  * INT64 columns as single PLAIN v1 data pages (no level bytes — a
  * required flat leaf has none), and a thrift-COMPACT FileMetaData
  * footer emitted by the encoder below (the write twin of the
  * reader's TC cursor). No compression, no statistics: the smallest
  * layout every parquet reader must accept.
  *
  * The layout is fully DETERMINISTIC — same rows, same bytes — so an
  * independent Python reimplementation pins the output byte for byte
  * (md5), and parquet-mr (Spark's reader) + pyarrow serve as
  * independent READERS of what this writes (ParquetSpec / the
  * fixture script). That closes the loop: the engine can write the
  * format it reads, from first principles on both sides.
  *
  * Spec source: parquet-format's parquet.thrift + the thrift compact
  * protocol spec (field-delta headers, zigzag varints, size-prefixed
  * lists).
  */
object ParquetWrite {

  // ---- thrift compact encoder -------------------------------------------

  private final class TCW {
    val out = new java.io.ByteArrayOutputStream()
    private var lastId = List(0) // per-struct field-id stack

    private def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
    }
    private def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))

    private def fieldHeader(id: Int, tpe: Int): Unit = {
      val delta = id - lastId.head
      if (delta >= 1 && delta <= 15) out.write((delta << 4) | tpe)
      else { out.write(tpe); zigzag(id.toLong) }
      lastId = id :: lastId.tail
    }
    def i32(id: Int, v: Long): Unit = { fieldHeader(id, 5); zigzag(v) }
    def i64(id: Int, v: Long): Unit = { fieldHeader(id, 6); zigzag(v) }
    def str(id: Int, s: String): Unit = {
      fieldHeader(id, 8)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      varint(b.length.toLong); out.write(b, 0, b.length)
    }
    /** Open a LIST field; caller emits `size` elements of `elemTpe`. */
    def list(id: Int, size: Int, elemTpe: Int): Unit = {
      fieldHeader(id, 9)
      if (size < 15) out.write((size << 4) | elemTpe)
      else { out.write(0xf0 | elemTpe); varint(size.toLong) }
    }
    /** A bare i32 list element (zigzag varint, no header). */
    def elemI32(v: Long): Unit = zigzag(v)
    /** A bare string list element. */
    def elemStr(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def bytesField(id: Int, b: Array[Byte]): Unit = {
      fieldHeader(id, 8)
      varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def structField(id: Int): Unit = { fieldHeader(id, 12); push() }
    /** A bare struct list element. */
    def elemStruct(): Unit = push()
    private def push(): Unit = { lastId = 0 :: lastId }
    def end(): Unit = { out.write(0); lastId = lastId.tail }
  }

  /** Write `names.length` REQUIRED INT64 columns; `rows(i)(c)` is the
    * value of column c in row i. One row group, one PLAIN page per
    * column. `codec` 0 = UNCOMPRESSED (byte layout unchanged from the
    * q295 md5-pinned form), 1 = SNAPPY through the engine's OWN
    * compressor ([[Snappy.compress]] — real LZ77, snappy-java-pinned).
    */
  def writeInt64(names: Seq[String], rows: Seq[Array[Long]],
                 codec: Int = 0, withStats: Boolean = false)
      : Array[Byte] = {
    require(names.nonEmpty && rows.forall(_.length == names.length))
    require(codec == 0 || codec == 1, s"codec $codec")
    // single-page writer: 8 * n must stay far from Int overflow
    require(rows.length <= (1 << 26), s"too many rows: ${rows.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    val n = rows.length
    // ---- column chunks: page header + PLAIN payload per column ----
    val offsets = new Array[Long](names.length)
    val chunkSizes = new Array[Long](names.length)
    val uncompSizes = new Array[Long](names.length)
    for (c <- names.indices) {
      offsets(c) = out.size().toLong
      val plain = new Array[Byte](8 * n)
      // iterate, never index: a List-backed Seq would turn indexed
      // access into O(n^2)
      val it = rows.iterator
      var i = 0
      while (it.hasNext) {
        var v = it.next()(c)
        var k = 0
        while (k < 8) {
          plain(i * 8 + k) = (v & 0xff).toByte; v >>>= 8; k += 1
        }
        i += 1
      }
      val body = if (codec == 1) Snappy.compress(plain) else plain
      val h = new TCW
      h.i32(1, 0)                 // page_type = DATA_PAGE
      h.i32(2, plain.length.toLong) // uncompressed_page_size
      h.i32(3, body.length.toLong)  // compressed_page_size
      h.structField(5)            // data_page_header
      h.i32(1, n.toLong)          // num_values
      h.i32(2, 0)                 // encoding = PLAIN
      h.i32(3, 3)                 // definition_level_encoding = RLE
      h.i32(4, 3)                 // repetition_level_encoding = RLE
      h.end()
      h.end()                     // PageHeader stop
      val hb = h.out.toByteArray
      out.write(hb, 0, hb.length)
      out.write(body, 0, body.length)
      chunkSizes(c) = hb.length + body.length
      uncompSizes(c) = hb.length + plain.length
    }
    // ---- footer ----------------------------------------------------
    val f = new TCW
    f.i32(1, 1)                         // version
    f.list(2, names.length + 1, 12)     // schema
    f.elemStruct()                      // root
    f.str(4, "schema")
    f.i32(5, names.length.toLong)       // num_children
    f.end()
    for (nm <- names) {
      f.elemStruct()
      f.i32(1, 2)                       // type = INT64
      f.i32(3, 0)                       // repetition = REQUIRED
      f.str(4, nm)
      f.end()
    }
    f.i64(3, n.toLong)                  // num_rows
    f.list(4, 1, 12)                    // row_groups
    f.elemStruct()
    f.list(1, names.length, 12)         // columns
    for (c <- names.indices) {
      f.elemStruct()                    // ColumnChunk
      f.i64(2, offsets(c))              // file_offset
      f.structField(3)                  // meta_data
      f.i32(1, 2)                       // type = INT64
      f.list(2, 1, 5); f.elemI32(0)     // encodings = [PLAIN]
      f.list(3, 1, 8); f.elemStr(names(c)) // path_in_schema
      f.i32(4, codec.toLong)            // codec
      f.i64(5, n.toLong)                // num_values
      f.i64(6, uncompSizes(c))          // total_uncompressed_size
      f.i64(7, chunkSizes(c))           // total_compressed_size
      f.i64(9, offsets(c))              // data_page_offset
      if (withStats && n > 0) {
        // footer Statistics: the stats-driven skip loop's write side
        // (null_count, min_value/max_value as PLAIN LE64)
        var mn = Long.MaxValue
        var mx = Long.MinValue
        val it2 = rows.iterator
        while (it2.hasNext) {
          val v = it2.next()(c)
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        def le8(v: Long): Array[Byte] =
          Array.tabulate[Byte](8)(k => ((v >>> (8 * k)) & 0xff).toByte)
        f.structField(12)
        f.i64(3, 0L)                    // null_count
        f.bytesField(5, le8(mx))        // max_value
        f.bytesField(6, le8(mn))        // min_value
        f.end()
      }
      f.end()                           // ColumnMetaData
      f.end()                           // ColumnChunk
    }
    f.i64(2, chunkSizes.sum)            // total_byte_size
    f.i64(3, n.toLong)                  // num_rows
    f.end()                             // RowGroup
    f.str(6, "graft parquet writer")    // created_by
    f.end()                             // FileMetaData stop
    val fb = f.out.toByteArray
    out.write(fb, 0, fb.length)
    val len = fb.length
    out.write(len & 0xff); out.write((len >> 8) & 0xff)
    out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }
}
