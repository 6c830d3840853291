package graft.sources

/** Compose a Hudi copy-on-write table from first principles: data
  * file slices named `<fileId>_<token>_<instant>.parquet` through the
  * engine's own parquet writer, plus a `.hoodie/` timeline of
  * canonical-JSON commit files (python json.dumps(sort_keys) byte
  * form) and an inflight marker. Deterministic; the independent
  * Python twin (scripts/make_hudi_write_oracle.py) reproduces the
  * bundle byte for byte for q302's md5 join. The written table
  * carries the same two baits the q283 READ fixture plants: a
  * rewritten file group (last-wins required) and an inflight slice
  * with poisoned values (completed-only required).
  */
object HudiWrite {

  private def statsJson(fileId: String, path: String,
                        n: Long): String =
    s"""{"fileId": "$fileId", "numDeletes": 0, "numUpdateWrites": 0, "numWrites": $n, "path": "$path"}"""

  def commitJson(stats: Seq[(String, String, Long)]): String =
    s"""{"operation": "UPSERT", "partitionToWriteStats": {"p": [${
      stats.map { case (f, p, n) => statsJson(f, p, n) }.mkString(", ")
    }]}}"""

  /** The q302 table bundle: fg0 at t1 rewritten at t2 (val+5), fg1
    * at t1, an INFLIGHT t3 slice of fg1 with poisoned values.
    * Returns rel_path -> bytes.
    */
  def writeTable(ids: Seq[Long]): Map[String, Array[Byte]] = {
    val fg = (0 to 1).map(x => ids.filter(d => (d / 6) % 2 == x))
    def data(p: Seq[Long], bump: Long): Array[Byte] =
      ParquetWrite.writeInt64(Seq("rec_id", "val"),
        p.map(d => Array(d, (d * 13) % 1000 + bump)))
    val t1 = "00000000000001"; val t2 = "00000000000002"
    val t3 = "00000000000003"
    def dname(fid: String, instant: String) =
      s"p/${fid}_0-0-0_$instant.parquet"
    val fg0v1 = data(fg(0), 0L)
    val fg1v1 = data(fg(1), 0L)
    val fg0v2 = data(fg(0), 5L)
    val fg1v3 = data(fg(1), 999L) // inflight poison
    Map(
      s".hoodie/$t1.commit" -> (commitJson(Seq(
        ("fg0", dname("fg0", t1), fg(0).length.toLong),
        ("fg1", dname("fg1", t1), fg(1).length.toLong)))
        .getBytes("UTF-8")),
      s".hoodie/$t2.commit" -> (commitJson(Seq(
        ("fg0", dname("fg0", t2), fg(0).length.toLong)))
        .getBytes("UTF-8")),
      s".hoodie/$t3.inflight" -> "{}".getBytes("UTF-8"),
      dname("fg0", t1) -> fg0v1,
      dname("fg1", t1) -> fg1v1,
      dname("fg0", t2) -> fg0v2,
      dname("fg1", t3) -> fg1v3)
  }
}
