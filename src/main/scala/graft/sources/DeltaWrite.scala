package graft.sources

/** Compose a complete Delta table from first principles: data files
  * through the engine's own parquet writer ([[ParquetWrite]]) and a
  * `_delta_log` of CANONICAL JSON commits — sorted keys, ", " / ": "
  * separators — the exact byte form `json.dumps(sort_keys=True)`
  * emits, so the independent Python twin
  * (scripts/make_delta_write_oracle.py) reproduces the whole bundle
  * byte for byte and q299's md5 join pins every byte of table, log,
  * and escaping.
  *
  * Spec source: delta-io/delta PROTOCOL.md (action shapes); the
  * commit layout mirrors what delta writers emit — protocol +
  * metaData + adds in commit 0, remove + add in commit 1.
  */
object DeltaWrite {

  /** The table schema as delta's schemaString (canonical JSON). */
  val SchemaString: String =
    """{"fields": [{"metadata": {}, "name": "rec_id", "nullable": false, "type": "long"}, {"metadata": {}, "name": "val", "nullable": false, "type": "long"}], "type": "struct"}"""

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def addAction(path: String, size: Long): String =
    s"""{"add": {"dataChange": true, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  def removeAction(path: String): String =
    s"""{"remove": {"dataChange": true, "deletionTimestamp": 1700000001000, "path": "$path"}}"""

  val protocolAction: String =
    """{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}"""

  def metaDataAction(id: String): String =
    s"""{"metaData": {"configuration": {}, "createdTime": 1700000000000, "format": {"options": {}, "provider": "parquet"}, "id": "$id", "partitionColumns": [], "schemaString": "${esc(SchemaString)}"}}"""

  /** The q299 table bundle: three data files split by (d/6) % 3,
    * commit 0 adds A+B, commit 1 removes B and adds C (the q254
    * replay shape). Returns rel_path -> bytes.
    */
  def writeTable(id: String,
                 ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 2).map(x => ids.filter(d => (d / 6) % 3 == x))
    val names = Seq("part-A.parquet", "part-B.parquet",
      "part-C.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 11) % 1000))))
    val c0 = Seq(protocolAction, metaDataAction(id),
      addAction(names(0), data(0).length.toLong),
      addAction(names(1), data(1).length.toLong)).mkString("\n") + "\n"
    val c1 = Seq(removeAction(names(1)),
      addAction(names(2), data(2).length.toLong)).mkString("\n") + "\n"
    Map(
      "_delta_log/00000000000000000000.json" ->
        c0.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "_delta_log/00000000000000000001.json" ->
        c1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      names(0) -> data(0), names(1) -> data(1), names(2) -> data(2))
  }
}
