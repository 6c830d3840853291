package graft

import graft.sources.{DeltaWrite, Parquet}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Delta OPTIMIZE write path (q339): log replay to the live
  * set, bin-packed compaction through the own parquet writer, the
  * dataChange=false commit discipline, and the fixed-point /
  * preservation laws.
  */
class DeltaMaintSpec extends AnyFunSuite {

  private val ids = (0L until 90L).toSeq

  test("optimize: live set collapses, rows preserved and sorted, " +
    "commit is dataChange=false only, second optimize is stable") {
    val files = DeltaWrite.writeTable("t-1", ids)
    val (livePre, maxV) = DeltaWrite.replayLive(files)
      .getOrElse(fail("replay"))
    assert(livePre == Seq("part-A.parquet", "part-C.parquet") &&
      maxV == 1L)
    val res = DeltaWrite.optimize(files).getOrElse(fail("optimize"))
    assert(res.commitName == "_delta_log/00000000000000000002.json")
    assert(res.removed == livePre)
    val after = files + (res.commitName -> res.commit) +
      (res.compactedName -> res.compacted)
    val (livePost, _) = DeltaWrite.replayLive(after)
      .getOrElse(fail("post replay"))
    assert(livePost == Seq(res.compactedName))
    // rows: exactly the live (B-removed) set, sorted by rec_id
    val want = ids.filter(d => (d / 6) % 3 != 1)
    val rs = Parquet.columnLongs(res.compacted, "rec_id")
      .getOrElse(fail("rec_id")).toSeq
    val vs = Parquet.columnLongs(res.compacted, "val")
      .getOrElse(fail("val")).toSeq
    assert(rs == want.sorted)
    assert(vs == want.sorted.map(d => (d * 11) % 1000))
    // every action in the optimize commit carries dataChange: false
    val lines = new String(res.commit, "UTF-8").split("\n")
      .filter(_.nonEmpty)
    assert(lines.length == 3)
    assert(lines.forall(_.contains("\"dataChange\": false")))
    // a second optimize compacts the single file to the same rows
    val res2 = DeltaWrite.optimize(after).getOrElse(fail("opt2"))
    assert(res2.rows == res.rows)
    assert(java.util.Arrays.equals(
      Parquet.columnLongs(res2.compacted, "rec_id").get,
      Parquet.columnLongs(res.compacted, "rec_id").get))
  }

  test("optimize: malformed tables close as None") {
    val files = DeltaWrite.writeTable("t-2", ids)
    // a live data file missing from the bundle
    assert(DeltaWrite.optimize(files - "part-A.parquet").isEmpty)
    // a corrupt commit line
    val bad = files + ("_delta_log/00000000000000000001.json" ->
      "{nope\n".getBytes("UTF-8"))
    assert(DeltaWrite.optimize(bad).isEmpty)
    // no log at all
    assert(DeltaWrite.optimize(files.filterNot(
      _._1.startsWith("_delta_log/"))).isEmpty)
    // a table whose replay leaves nothing live cannot be compacted
    val allGone = files + ("_delta_log/00000000000000000002.json" ->
      (DeltaWrite.removeActionDc("part-A.parquet", dataChange = true) +
        "\n" +
        DeltaWrite.removeActionDc("part-C.parquet", dataChange = true) +
        "\n").getBytes("UTF-8"))
    assert(DeltaWrite.optimize(allGone).isEmpty)
  }
}
