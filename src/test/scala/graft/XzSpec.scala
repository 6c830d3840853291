package graft

import graft.sources.{Crc64, Lzma2, Xz}

/** Pins the from-scratch XZ walk + LZMA decoder against liblzma (the
  * INDEPENDENT writer behind python lzma, via the fixture blobs):
  * container structure, byte-exact decode, check verification for
  * both CRC32 and CRC64, and the damage shapes that must close — a
  * payload flip must be caught by decode failure or check mismatch,
  * never surfaced as silent wrong bytes.
  */
class XzSpec extends SparkSpec {

  private def fixture =
    spark.read.parquet("fixtures/xz_files.parquet")
      .collect() // bounded: 24 fixture files
      .map(r => (r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("file_bytes")))

  private def decodeAll(b: Array[Byte]): Option[(Int, Array[Byte])] =
    Xz.parseAll(b).flatMap { streams =>
      val out = new java.io.ByteArrayOutputStream()
      var ok = streams.nonEmpty
      streams.foreach(_.blocks.foreach { blk =>
        Lzma2.decode(b, blk.dataStart, blk.unpackedLen) match {
          case Some(x) => out.write(x, 0, x.length)
          case None => ok = false
        }
      })
      if (ok) Some((streams.head.checkType, out.toByteArray))
      else None
    }

  private def checkHolds(b: Array[Byte]): Boolean =
    Xz.parseAll(b).exists(_.forall { info =>
      info.blocks.forall { blk =>
        Lzma2.decode(b, blk.dataStart, blk.unpackedLen).exists { x =>
          val co = ((blk.dataStart + blk.packedLen + 3L) / 4 * 4).toInt
          info.checkType match {
            case 1 =>
              val c = new java.util.zip.CRC32(); c.update(x)
              (0 to 3).map(k => (b(co + k) & 0xffL) << (8 * k)).sum ==
                c.getValue
            case 4 =>
              (0 to 7).map(k => (b(co + k) & 0xffL) << (8 * k)).sum ==
                Crc64.of(x, 0, x.length)
            case _ => false
          }
        }
      }
    })

  test("liblzma-written xz decodes byte-exact: every line matches the " +
    "writer formula, checks (CRC32 and engine-owned CRC64) verify") {
    val rows = fixture
    assert(rows.length == 48)
    assert(rows.map(_._1).toSet ==
      Set("crc32", "crc64", "concat", "alone"))
    for ((kind, b) <- rows if kind != "alone") {
      val (check, out) = decodeAll(b).getOrElse(fail(s"$kind decode"))
      if (kind != "concat") {
        assert(Xz.checkName(check) == kind)
        // the plain single-stream parse also accepts these
        assert(Xz.parse(b).isDefined)
      } else {
        // cat-ed streams: strict single-stream parse refuses, the
        // multi-stream walk sees exactly two
        assert(Xz.parse(b).isEmpty)
        assert(Xz.parseAll(b).exists(_.length == 2))
      }
      val lines = new String(out, "UTF-8").split("\n")
      assert(lines.nonEmpty)
      for (l <- lines) {
        val m = "doc (\\d+): payload (\\d+)".r
        l match {
          case m(d, v) => assert(v.toLong == (d.toLong * 17) % 1000)
          case _ => fail(s"line '$l'")
        }
      }
      assert(checkHolds(b), s"$kind check")
    }
  }

  test("legacy .lzma (alone format): unknown-length streams decode to " +
    "the end marker; truncation before the marker fails closed") {
    val rows = fixture.filter(_._1 == "alone")
    assert(rows.length == 12)
    for ((_, b) <- rows) {
      val out = Lzma2.decodeAlone(b).getOrElse(fail("alone decode"))
      val lines = new String(out, "UTF-8").split("\n")
      val m = "doc (\\d+): payload (\\d+)".r
      for (l <- lines) l match {
        case m(d, v) => assert(v.toLong == (d.toLong * 17) % 1000)
        case _ => fail(s"line '$l'")
      }
      // an unknown-length stream cut before the marker must fail
      assert(Lzma2.decodeAlone(
        java.util.Arrays.copyOf(b, b.length - 4)).isEmpty)
      for (cut <- 0 until b.length by 9)
        Lzma2.decodeAlone(java.util.Arrays.copyOf(b, cut))
    }
  }

  test("damage fails closed: every payload byte flip is caught by the " +
    "walk, the decoder, or the check — never silent wrong bytes; " +
    "truncations never throw") {
    val b = fixture.find(_._1 == "crc32").get._2
    val info = Xz.parse(b).get
    val blk = info.blocks.head
    val orig = Lzma2.decode(b, blk.dataStart, blk.unpackedLen).get
    var caught = 0
    var total = 0
    for (i <- blk.dataStart until (blk.dataStart + blk.packedLen.toInt)
           by 3) {
      total += 1
      val c = b.clone(); c(i) = (c(i) ^ 0x5a).toByte
      // silent WRONG bytes = decode succeeds, output differs from
      // the truth, AND the check still passes. (A flip in the range
      // coder's don't-care tail bits can legally decode IDENTICAL
      // output — that is not corruption.)
      val silentWrong = Xz.parse(c).exists { in2 =>
        in2.blocks.headOption.exists { bl2 =>
          Lzma2.decode(c, bl2.dataStart, bl2.unpackedLen).exists { x =>
            !java.util.Arrays.equals(x, orig) && checkHolds(c)
          }
        }
      }
      if (!silentWrong) caught += 1
    }
    assert(caught == total,
      s"flips surfacing silent wrong bytes: ${total - caught}/$total")
    for (cut <- 0 until b.length by 3) {
      val t = java.util.Arrays.copyOf(b, cut)
      Xz.parse(t).foreach(_.blocks.foreach(bl =>
        Lzma2.decode(t, bl.dataStart, bl.unpackedLen)))
    }
  }
}
