package graft.sources

/** Compose an Iceberg table's METADATA tree from first principles:
  * `vN.metadata.json` (hand-built canonical JSON), the manifest-list
  * Avro container, and a data manifest — through a from-scratch Avro
  * object-container writer (header map, sync markers, count/size
  * block framing) and the binary record encoding (zigzag varints,
  * length-prefixed strings). The layout is deterministic, the
  * engine's own generic Avro reader ([[AvroGeneric.parseContainer]])
  * and JSON parser round-trip it, and the independent Python twin
  * (scripts/make_iceberg_write_oracle.py) reproduces the whole
  * bundle byte for byte for q301's md5 join.
  *
  * With [[DeltaWrite]] (q299) and the Hudi fixture shapes this
  * closes metadata WRITING for the lakehouse formats the engine
  * reads.
  */
object IcebergWrite {

  /** Reduced-but-valid manifest schemas (no unions — every field
    * required), shared verbatim with the Python twin.
    */
  val EntrySchema: String =
    """{"type":"record","name":"manifest_entry","fields":[{"name":"status","type":"int"},{"name":"data_file","type":{"type":"record","name":"r2","fields":[{"name":"file_path","type":"string"},{"name":"record_count","type":"long"},{"name":"file_size_in_bytes","type":"long"}]}}]}"""
  val ListSchema: String =
    """{"type":"record","name":"manifest_file","fields":[{"name":"manifest_path","type":"string"},{"name":"manifest_length","type":"long"},{"name":"added_files_count","type":"int"},{"name":"added_rows_count","type":"long"}]}"""

  private def varint(out: java.io.ByteArrayOutputStream,
                     v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7
    }
    out.write(z.toInt)
  }

  private def str(out: java.io.ByteArrayOutputStream,
                  s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    varint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  /** One Avro object container: null codec, one block. */
  def container(schemaJson: String, records: Seq[Array[Byte]],
                sync: Array[Byte]): Array[Byte] = {
    require(sync.length == 16)
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    varint(out, 2L)
    str(out, "avro.schema"); str(out, schemaJson)
    str(out, "avro.codec"); str(out, "null")
    varint(out, 0L)
    out.write(sync, 0, 16)
    val body = new java.io.ByteArrayOutputStream()
    records.foreach(r => body.write(r, 0, r.length))
    varint(out, records.length.toLong)
    varint(out, body.size().toLong)
    body.writeTo(out)
    out.write(sync, 0, 16)
    out.toByteArray
  }

  def entry(path: String, rc: Long, fsz: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    varint(out, 1L) // status = ADDED
    str(out, path)
    varint(out, rc)
    varint(out, fsz)
    out.toByteArray
  }

  def manifestFileRow(path: String, length: Long, files: Long,
                      rows: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    str(out, path)
    varint(out, length)
    varint(out, files)
    varint(out, rows)
    out.toByteArray
  }

  /** The q301 metadata tree: three ADDED files split by (d/6) % 3
    * with relational record counts, one manifest, one list, one
    * metadata.json. Returns rel_path -> bytes.
    */
  def writeTable(id: String,
                 ids: Seq[Long]): Map[String, Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sync = md.digest(("sync:" + id).getBytes("UTF-8"))
    val parts = (0 to 2).map(x => ids.filter(d => (d / 6) % 3 == x))
    val entries = parts.zipWithIndex.map { case (p, x) =>
      entry(s"data/f-$x.parquet", p.length.toLong,
        p.map(d => 1L + d % 9).sum)
    }
    val manifest = container(EntrySchema, entries, sync)
    val list = container(ListSchema, Seq(manifestFileRow(
      "m1.avro", manifest.length.toLong, 3L,
      ids.length.toLong)), sync)
    val meta = ("""{"format-version": 2, "table-uuid": """" + id +
      """", "current-snapshot-id": 1, "snapshots": [{"snapshot-id": 1, "sequence-number": 1, "timestamp-ms": 1700000000000, "manifest-list": "snap-1.avro"}]}""")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Map("v1.metadata.json" -> meta, "snap-1.avro" -> list,
      "m1.avro" -> manifest)
  }
}
