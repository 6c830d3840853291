package graft

import graft.sources.Bzip2

/** From-scratch bzip2 decoder pinned against CPython's bz2 module (the
  * independent libbzip2 encoder) via fixtures/bz2_golden.parquet —
  * shapes chosen to exercise every decode stage — plus damage totality.
  */
class Bzip2Spec extends SparkSpec {

  private lazy val golden: Seq[(String, Array[Byte], Array[Byte])] =
    spark.read.parquet("fixtures/bz2_golden.parquet")
      .collect() // bounded: 8 golden cases
      .map(r => (r.getAs[String]("name"), r.getAs[Array[Byte]]("payload"),
        r.getAs[Array[Byte]]("bz")))
      .toSeq

  test("every CPython-written golden stream decodes byte-for-byte: " +
    "RLE1 runs, full byte alphabet, multi-block level-1 streams, " +
    "concatenated streams, high-entropy group switching") {
    assert(golden.size == 8)
    for ((name, payload, bz) <- golden) {
      val got = Bzip2.decompress(bz)
      assert(got.isDefined, s"$name must decode")
      assert(java.util.Arrays.equals(got.get, payload),
        s"$name: ${got.get.length} vs ${payload.length} bytes")
    }
    // the multi-block case must really be multi-block: level 1 holds
    // 100k per block and the payload is larger
    val mb = golden.find(_._1 == "multi_block").get
    assert(mb._2.length > 100000, "fixture must force several blocks")
  }

  test("damage fails closed: bad magics, truncation, bit flips, CRC " +
    "lies, randomized-block flag, not-bzip2 input") {
    val (_, _, bz) = golden.find(_._1 == "short_text").get
    assert(Bzip2.decompress(bz).isDefined)
    // not bzip2 / empty
    assert(Bzip2.decompress(Array.empty[Byte]).isEmpty)
    assert(Bzip2.decompress("BZh9 not really".getBytes).isEmpty)
    assert(Bzip2.decompress("PKjunk".getBytes).isEmpty)
    // bad level digit
    val lvl = bz.clone(); lvl(3) = '0'
    assert(Bzip2.decompress(lvl).isEmpty)
    // truncated anywhere in the tail
    for (cut <- Seq(4, bz.length / 2, bz.length - 1))
      assert(Bzip2.decompress(bz.take(cut)).isEmpty, s"cut=$cut")
    // a flipped bit anywhere must NEVER yield silent wrong bytes: it
    // either fails (structure or CRC) or decodes to the exact original
    // (flips in a never-used symbol's code length are legitimately
    // inert — the tables change, the decode does not)
    val want = golden.find(_._1 == "short_text").get._2
    var caught = 0
    for (at <- 4 until bz.length; bit <- Seq(0x10, 0x01)) {
      val bad = bz.clone()
      bad(at) = (bad(at) ^ bit).toByte
      Bzip2.decompress(bad) match {
        case None => caught += 1
        case Some(got) =>
          assert(java.util.Arrays.equals(got, want),
            s"flip at $at/$bit: wrong bytes escaped the CRC")
      }
    }
    // and the CRC must be doing real work: most flips are caught
    assert(caught > bz.length, s"only $caught flips caught")
    // stream-CRC lie: flip a bit inside the final combined CRC
    val tail = bz.clone()
    tail(tail.length - 1) = (tail(tail.length - 1) ^ 0x01).toByte
    assert(Bzip2.decompress(tail).isEmpty)
    // output cap: the bound trips instead of allocating
    val big = golden.find(_._1 == "multi_block").get._3
    assert(Bzip2.decompress(big, cap = 1000).isEmpty)
  }
}
