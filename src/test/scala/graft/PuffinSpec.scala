package graft

import graft.sources.{Puffin, ThetaSketch}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the own theta sketch against datasketches-java itself (hash
  * discipline, byte format both directions, estimates) and the puffin
  * container roundtrip + totality.
  */
class PuffinSpec extends AnyFunSuite {

  test("murmur x64-128 long-hash matches datasketches-java exactly") {
    import org.apache.datasketches.hash.{MurmurHash3 => M}
    for (v <- Seq(0L, 1L, -1L, 42L, 9001L, Long.MaxValue,
      Long.MinValue, 123456789012345L))
      assert(ThetaSketch.hashLong(v, 9001L) ==
        M.hash(Array(v), 9001L)(0), s"v=$v")
    assert(ThetaSketch.seedHash(9001L) ==
      (M.hash(Array(9001L), 0L)(0) & 0xffffL).toInt)
  }

  test("own exact-mode compact bytes: datasketches-java wraps them, " +
    "estimate is the exact distinct count, both parsers agree") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.Sketches
    val values = (0L until 500L).map(d => d % 311) // 311 distinct
    val bytes = ThetaSketch.compact(values)
    val ds = Sketches.wrapSketch(Memory.wrap(bytes))
    assert(ds.getEstimate == 311.0)
    assert(ds.getRetainedEntries(true) == 311)
    assert(ds.isOrdered && !ds.isEmpty)
    val own = ThetaSketch.parse(bytes).getOrElse(fail("parse"))
    assert(own.estimate == 311.0 && own.retained == 311 &&
      own.theta == 1.0)
  }

  test("datasketches-built compact sketch parses through the own " +
    "reader with the identical estimate") {
    import org.apache.datasketches.theta.UpdateSketch
    val us = UpdateSketch.builder().build()
    (0L until 700L).foreach(v => us.update(v % 123))
    val bytes = us.compact(true, null).toByteArray
    val own = ThetaSketch.parse(bytes).getOrElse(fail("parse"))
    assert(own.estimate == 123.0 && own.retained == 123)
  }

  test("sampling mode (n >> k): valid bytes, shared estimate, " +
    "within 3 standard errors of truth") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.Sketches
    val n = 20000
    val bytes = ThetaSketch.compact(
      (0 until n).map(_.toLong), lgK = 6) // k = 64
    val own = ThetaSketch.parse(bytes).getOrElse(fail("parse"))
    assert(own.retained == 64 && own.theta < 1.0)
    val ds = Sketches.wrapSketch(Memory.wrap(bytes))
    assert(math.abs(ds.getEstimate - own.estimate) < 1e-6)
    val se = own.estimate / math.sqrt(64.0)
    assert(math.abs(own.estimate - n) < 3 * se,
      s"estimate ${own.estimate} vs $n")
  }

  test("empty sketch roundtrips both parsers") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.Sketches
    val bytes = ThetaSketch.compact(Nil)
    assert(Sketches.wrapSketch(Memory.wrap(bytes)).isEmpty)
    val own = ThetaSketch.parse(bytes).getOrElse(fail("parse"))
    assert(own.empty && own.estimate == 0.0)
  }

  test("union: exact mode is EXACT set union (equals datasketches' " +
    "own Union over the same sketches); sampling mode stays valid " +
    "and within bounds") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    // three overlapping exact sketches
    val parts = Seq((0L until 400L), (200L until 600L),
      (500L until 900L))
    val sks = parts.map(p => ThetaSketch.compact(p))
    val u = ThetaSketch.union(sks).getOrElse(fail("union"))
    val own = ThetaSketch.parse(u).getOrElse(fail("parse"))
    assert(own.estimate == 900.0 && own.theta == 1.0)
    val dsU = SetOperation.builder().buildUnion()
    sks.foreach(b => dsU.union(Memory.wrap(b)))
    assert(dsU.getResult.getEstimate == 900.0)
    assert(Sketches.wrapSketch(Memory.wrap(u)).getEstimate == 900.0)
    // sampling mode: unions of small-k sketches stay valid sketches
    val big = Seq((0 until 30000).map(_.toLong),
      (20000 until 50000).map(_.toLong))
    val bs = big.map(p => ThetaSketch.compact(p, lgK = 6))
    val bu = ThetaSketch.union(bs, lgK = 6).getOrElse(fail("bu"))
    val r = ThetaSketch.parse(bu).getOrElse(fail("bp"))
    assert(r.retained <= 64 && r.theta < 1.0)
    assert(Sketches.wrapSketch(Memory.wrap(bu)).getEstimate ==
      r.estimate)
    val se = r.estimate / math.sqrt(64.0)
    assert(math.abs(r.estimate - 50000) < 4 * se, r.estimate)
    // malformed input closes the union
    assert(ThetaSketch.union(sks :+ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("intersect / aNotB: exact set algebra, agreeing with " +
    "datasketches' own Intersection and AnotB operators") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    val a = ThetaSketch.compact(0L until 500L)
    val b = ThetaSketch.compact(300L until 800L)
    val i = ThetaSketch.intersect(Seq(a, b)).getOrElse(fail("i"))
    assert(ThetaSketch.parse(i).get.estimate == 200.0)
    val d = ThetaSketch.aNotB(a, b).getOrElse(fail("d"))
    assert(ThetaSketch.parse(d).get.estimate == 300.0)
    val dsI = SetOperation.builder().buildIntersection()
    dsI.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    dsI.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    assert(dsI.getResult.getEstimate == 200.0)
    val dsD = SetOperation.builder().buildANotB()
    assert(dsD.aNotB(Sketches.wrapSketch(Memory.wrap(a)),
      Sketches.wrapSketch(Memory.wrap(b))).getEstimate == 300.0)
    // datasketches reads our set-op outputs
    assert(Sketches.wrapSketch(Memory.wrap(i)).getEstimate == 200.0)
    assert(Sketches.wrapSketch(Memory.wrap(d)).getEstimate == 300.0)
    // disjoint intersection -> exact empty
    val c = ThetaSketch.compact(10000L until 10100L)
    val ie = ThetaSketch.intersect(Seq(a, c)).getOrElse(fail("ie"))
    assert(ThetaSketch.parse(ie).get.estimate == 0.0)
    // exact-mode partition identity: |A ∪ B| = |B| + |A \ B|
    val u = ThetaSketch.union(Seq(a, b)).getOrElse(fail("u"))
    assert(ThetaSketch.parse(u).get.estimate ==
      ThetaSketch.parse(b).get.estimate +
        ThetaSketch.parse(d).get.estimate)
    assert(ThetaSketch.intersect(Nil).isEmpty)
    assert(ThetaSketch.aNotB(a, Array[Byte](9)).isEmpty)
  }

  test("puffin: write/read roundtrip preserves blobs, metadata, " +
    "properties; footer size law") {
    val b1 = ThetaSketch.compact((0L until 100L))
    val b2 = ThetaSketch.compact((0L until 100L).map(_ % 7))
    val file = Puffin.write(Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(1), 77L, 1L,
        b1, Map("ndv" -> "100")),
      Puffin.Blob("apache-datasketches-theta-v1", Seq(2), 77L, 1L,
        b2, Map("ndv" -> "7"))),
      Map("created-by" -> "graft"))
    val (blobs, props) = Puffin.read(file).getOrElse(fail("read"))
    assert(props("created-by") == "graft")
    assert(blobs.length == 2)
    assert(blobs(0)._1.fields == Seq(1) &&
      blobs(0)._1.snapshotId == 77L &&
      blobs(0)._1.properties("ndv") == "100")
    assert(java.util.Arrays.equals(blobs(0)._2, b1))
    assert(java.util.Arrays.equals(blobs(1)._2, b2))
    assert(ThetaSketch.parse(blobs(1)._2).get.estimate == 7.0)
    val fs = Puffin.footerSize(file).getOrElse(fail("footer"))
    assert(fs > 16 && fs < file.length)
  }

  test("puffin totality: flipped magic, nonzero flags, bad offsets, " +
    "truncation all close as None") {
    val file = Puffin.write(Seq(Puffin.Blob(
      "apache-datasketches-theta-v1", Seq(1), 1L, 1L,
      ThetaSketch.compact(0L until 10L))), Map.empty)
    def flip(i: Int): Array[Byte] = {
      val t = file.clone(); t(i) = (t(i) ^ 0x01).toByte; t
    }
    assert(Puffin.read(flip(0)).isEmpty) // head magic
    assert(Puffin.read(flip(file.length - 1)).isEmpty) // tail magic
    assert(Puffin.read(flip(file.length - 8)).isEmpty) // flags
    assert(Puffin.read(file.dropRight(3)).isEmpty)
    assert(Puffin.read(Array.emptyByteArray).isEmpty)
  }
}
