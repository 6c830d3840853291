package graft

import graft.sources.TextEncoding

/** Pins the BOM sniff + strict decode (sources/TextEncoding.scala):
  * all four fixture encodings of the same text decode to identical
  * content, and malformed bytes are None — never U+FFFD substitution.
  */
class TextEncodingSpec extends SparkSpec {

  test("the four encodings of one text decode to IDENTICAL content, " +
    "BOM stripped, sniff matching the writer") {
    val rows = spark.read.parquet("fixtures/textenc_files.parquet")
      .collect() // bounded: 48 fixture rows
      .map(r => (r.getAs[String]("blob_key"), r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("file_bytes")))
    assert(rows.length == 48)
    rows.groupBy(_._1).foreach { case (_, grp) =>
      assert(grp.length == 4)
      val decoded = grp.map { case (_, kind, b) =>
        val (det, text) = TextEncoding.decode(b)
          .getOrElse(fail(s"$kind must decode"))
        assert(det.name == kind, s"sniff for $kind")
        text
      }
      assert(decoded.distinct.length == 1,
        "same content through every encoding")
      assert(!decoded.head.contains('﻿'), "BOM is not content")
      assert(decoded.head.contains('é') && decoded.head.contains('→'))
    }
  }

  test("strict decode fails closed: invalid UTF-8, truncated UTF-16, " +
    "unpaired surrogate — None, never replacement characters") {
    // overlong/invalid UTF-8 sequences
    assert(TextEncoding.decode(Array(0x61, 0xc0.toByte, 0xaf.toByte,
      0x62).map(_.toByte)).isEmpty)
    assert(TextEncoding.decode(Array[Byte](0x61, 0xff.toByte)).isEmpty)
    // UTF-16LE with an odd-length body
    assert(TextEncoding.decode(
      Array[Byte](0xff.toByte, 0xfe.toByte, 0x61, 0x00, 0x62)).isEmpty)
    // UTF-16BE with an unpaired high surrogate (D800 then EOF)
    assert(TextEncoding.decode(
      Array[Byte](0xfe.toByte, 0xff.toByte, 0xd8.toByte, 0x00)).isEmpty)
    // sanity: the plain forms still decode
    assert(TextEncoding.decode("plain".getBytes("UTF-8"))
      .exists(_._2 == "plain"))
    assert(TextEncoding.decode(Array[Byte]()).exists(_._2 == ""))
  }
}
