package graft

import graft.sources.Csv

/** Pins the from-scratch RFC 4180 parser (sources/Csv.scala) against
  * python csv's canonical output (the fixture blobs) and the damage
  * shapes that must close. The fixture's every row embeds a comma, a
  * doubled quote, and a bare LF — the three things that break any
  * line-splitting reader.
  */
class CsvSpec extends SparkSpec {

  test("python-csv-written blobs reassemble row by row: embedded " +
    "commas, doubled quotes, and quoted newlines land in ONE field") {
    val blobs = spark.read.parquet("fixtures/csv_files.parquet")
      .collect() // bounded: 12 fixture files
      .map(_.getAs[Array[Byte]]("file_bytes")).toSeq
    assert(blobs.length == 12)
    for (b <- blobs) {
      val rows = Csv.parse(b).getOrElse(fail("must parse"))
      assert(rows.head == Vector("doc_id", "name", "note"))
      assert(rows.length > 1)
      for (r <- rows.drop(1)) {
        assert(r.length == 3)
        val d = r(0).toLong
        assert(r(1) == s"n,${d % 7}", s"name at $d")
        assert(r(2) == "x\"" + (d % 5) + "\"\ny" + (d % 3),
          s"note at $d")
      }
      // the naive line count is ~2x the true row count (every note
      // embeds one LF) — proof the quoting state machine is earning
      // its keep
      val naive = new String(b, "UTF-8").split("\r?\n").length
      assert(naive > rows.length + rows.length / 2)
    }
  }

  test("hand cases: trailing empty field, no final newline, bare LF " +
    "endings, empty quoted field, quote-only field") {
    def p(s: String) = Csv.parse(s.getBytes("UTF-8"))
    assert(p("a,b\r\n1,\r\n").contains(
      Vector(Vector("a", "b"), Vector("1", ""))))
    assert(p("a,b\r\n1,2").contains(
      Vector(Vector("a", "b"), Vector("1", "2"))))
    assert(p("a,b\n1,2\n").contains(
      Vector(Vector("a", "b"), Vector("1", "2"))))
    assert(p("a\r\n\"\"\r\n").contains(Vector(Vector("a"), Vector(""))))
    assert(p("a\r\n\"\"\"\"\r\n").contains(
      Vector(Vector("a"), Vector("\""))))
    assert(p("").contains(Vector.empty))
  }

  test("damage fails closed: unclosed quote, bare quote mid-field, " +
    "junk after a closing quote, bare CR, ragged rows") {
    def p(s: String) = Csv.parse(s.getBytes("UTF-8"))
    assert(p("a,b\r\n\"unclosed").isEmpty)
    assert(p("a,b\r\nx\"y,2\r\n").isEmpty)
    assert(p("a,b\r\n\"x\"y,2\r\n").isEmpty)
    assert(p("a,b\rx,2\r\n").isEmpty)
    assert(p("a,b\r\n1,2,3\r\n").isEmpty)
    assert(p("a,b\r\n1\r\n").isEmpty)
    // arbitrary truncations of a real blob never throw
    val b = spark.read.parquet("fixtures/csv_files.parquet")
      .collect().head.getAs[Array[Byte]]("file_bytes")
    for (cut <- 0 until math.min(b.length, 600) by 7)
      Csv.parse(java.util.Arrays.copyOf(b, cut))
  }
}
