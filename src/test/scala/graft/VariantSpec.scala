package graft

import graft.sources.Variant
import graft.sources.Variant._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the from-scratch VARIANT binary codec (sources/Variant.scala,
  * the public parquet VariantEncoding.md) against Spark's own
  * reference implementation (org.apache.spark.types.variant) in BOTH
  * directions, plus the canonical-form law and the fail-closed
  * battery.
  */
class VariantSpec extends AnyFunSuite {

  private val battery: Seq[V] = Seq(
    VNull,
    VBool(true), VBool(false),
    VLong(0), VLong(42), VLong(-1), VLong(127), VLong(-128),
    VLong(128), VLong(-32768), VLong(32767), VLong(1 << 20),
    VLong(Int.MaxValue), VLong(Int.MaxValue + 1L), VLong(Long.MinValue),
    VDouble(2.5), VDouble(-0.125), VDouble(1e300),
    VDecimal(BigInt(12345), 2), VDecimal(BigInt(-999), 0),
    VDecimal(BigInt("123456789012345"), 5),
    VDecimal(BigInt("99999999999999999999999999999999999999"), 10),
    VString(""), VString("short"), VString("a" * 63),
    VString("b" * 64), VString("長い文字列" * 40),
    VObject(Vector()),
    VObject(Vector("k" -> VLong(7))),
    VObject(Vector("b" -> VString("x"), "a" -> VLong(1),
      "c" -> VNull)),
    VArray(Vector()),
    VArray(Vector(VLong(1), VString("two"), VBool(false), VNull)),
    VObject(Vector(
      "nested" -> VObject(Vector("deep" -> VArray(Vector(
        VObject(Vector("leaf" -> VDouble(3.5))))))),
      "id" -> VLong(99))),
    VArray(Vector.tabulate(300)(i => VLong(i.toLong))), // is_large
    VObject(Vector.tabulate(300)(i =>
      (f"key$i%04d", VLong(i.toLong)))) // large object, 2-byte ids
  )

  // the canonical form: object fields sorted (decode returns them
  // sorted — the encoder sorts, the spec requires it)
  private def canon(v: V): V = v match {
    case VObject(fs) => VObject(fs.map { case (k, x) =>
      (k, canon(x)) }.sortBy(_._1))
    case VArray(xs) => VArray(xs.map(canon))
    case x => x
  }

  test("round trip: decode(encode(v)) == canon(v) and re-encoding " +
    "is byte-identical (the canonical law)") {
    battery.foreach { v =>
      val (m, b) = Variant.encode(v)
      val back = Variant.decode(m, b)
      assert(back.contains(canon(v)), s"round trip of $v")
      val (m2, b2) = Variant.encode(back.get)
      assert(java.util.Arrays.equals(m, m2) &&
        java.util.Arrays.equals(b, b2), s"canonical for $v")
    }
  }

  test("own encodings read through SPARK's reference Variant: " +
    "typed getters, field lookup, array access, toJson parses") {
    import org.apache.spark.types.variant.{Variant => SV}
    val (m1, b1) = Variant.encode(VObject(Vector(
      "n" -> VLong(12345), "s" -> VString("hello"),
      "d" -> VDouble(2.5), "z" -> VBool(true),
      "dec" -> VDecimal(BigInt(314159), 5),
      "arr" -> VArray(Vector(VLong(1), VLong(2), VLong(3))),
      "big" -> VString("c" * 200))))
    val sv = new SV(b1, m1)
    assert(sv.getFieldByKey("n").getLong == 12345L)
    assert(sv.getFieldByKey("s").getString == "hello")
    assert(sv.getFieldByKey("d").getDouble == 2.5)
    assert(sv.getFieldByKey("z").getBoolean)
    assert(sv.getFieldByKey("dec").getDecimal ==
      new java.math.BigDecimal(java.math.BigInteger.valueOf(314159L),
        5))
    assert(sv.getFieldByKey("arr").arraySize() == 3)
    assert(sv.getFieldByKey("arr").getElementAtIndex(2).getLong == 3L)
    assert(sv.getFieldByKey("big").getString == "c" * 200)
    assert(sv.getFieldByKey("absent") == null)
    // every battery value renders through the reference toJson
    battery.foreach { v =>
      val (m, b) = Variant.encode(v)
      val js = new SV(b, m).toJson(java.time.ZoneId.of("UTC"))
      assert(js != null && js.nonEmpty, s"toJson of $v")
    }
  }

  test("SPARK-built variants (parseJson) decode through the own " +
    "walker with the exact values") {
    import org.apache.spark.types.variant.VariantBuilder
    def own(json: String): Option[V] = {
      val sv = VariantBuilder.parseJson(json, false)
      Variant.decode(sv.getMetadata, sv.getValue)
    }
    assert(own("null").contains(VNull))
    assert(own("true").contains(VBool(true)))
    assert(own("42").contains(VLong(42)))
    assert(own("-129").contains(VLong(-129)))
    assert(own("123456789012").contains(VLong(123456789012L)))
    assert(own("\"hey\"").contains(VString("hey")))
    assert(own("2.5").exists {
      case VDecimal(u, s) => BigDecimal(u, s) == BigDecimal("2.5")
      case VDouble(d) => d == 2.5
      case _ => false
    })
    assert(own("1.5e308").contains(VDouble(1.5e308)))
    assert(own("""{"b": 2, "a": [1, null, "x"], "c": {"d": false}}""")
      .contains(VObject(Vector(
        "a" -> VArray(Vector(VLong(1), VNull, VString("x"))),
        "b" -> VLong(2),
        "c" -> VObject(Vector("d" -> VBool(false)))))))
    // a >255-element array through the reference builder
    val big = (0 until 300).mkString("[", ", ", "]")
    assert(own(big).contains(
      VArray(Vector.tabulate(300)(i => VLong(i.toLong)))))
    // long string through the reference builder
    assert(own("\"" + "q" * 500 + "\"").contains(VString("q" * 500)))
  }

  test("getField: binary search over sorted ids == full decode's " +
    "field; absent / non-object / damaged refuse") {
    val obj = VObject(Vector.tabulate(40)(i =>
      (f"f$i%02d", if (i % 3 == 0) VLong(i.toLong)
      else VString(s"v$i"))))
    val (m, b) = Variant.encode(obj)
    val full = Variant.decode(m, b).get.asInstanceOf[VObject]
    full.fields.foreach { case (k, v) =>
      assert(Variant.getField(m, b, k).contains(v), k)
    }
    assert(Variant.getField(m, b, "zz").isEmpty)
    assert(Variant.getField(m, b, "").isEmpty)
    val (ms, bs) = Variant.encode(VString("not an object"))
    assert(Variant.getField(ms, bs, "k").isEmpty)
  }

  test("fail closed: version flips, truncation, non-monotonic " +
    "offsets, out-of-range field ids, unsorted objects, unknown " +
    "type ids, trailing bytes — None, never a throw") {
    val (m, b) = Variant.encode(VObject(Vector(
      "aa" -> VLong(1), "bb" -> VString("x"), "cc" -> VNull)))
    assert(Variant.decode(m, b).isDefined)
    def flip(x: Array[Byte], i: Int): Array[Byte] = {
      val c = x.clone(); c(i) = (c(i) ^ 0x02).toByte; c
    }
    // metadata damage
    assert(Variant.decode(flip(m, 0), b).isEmpty, "version")
    assert(Variant.decode(m.dropRight(1), b).isEmpty,
      "truncated dictionary")
    assert(Variant.decode(m ++ Array[Byte](0), b).isEmpty,
      "trailing metadata")
    assert(Variant.decode(Array.empty[Byte], b).isEmpty)
    val nm = m.clone() // offsets start at header+1(size byte)+...
    // make offsets non-monotonic: swap two offset bytes (1-byte offs)
    nm(3) = 5; nm(4) = 2
    assert(Variant.decode(nm, b).isEmpty, "non-monotonic offsets")
    // value damage
    assert(Variant.decode(m, b.dropRight(1)).isEmpty,
      "truncated value")
    assert(Variant.decode(m, b ++ Array[Byte](0)).isEmpty,
      "trailing value bytes")
    assert(Variant.decode(m, Array.empty[Byte]).isEmpty)
    // field id past the dictionary: bump an id byte
    val nb = b.clone()
    // layout: header, count, 3 ids (1 byte each) at 2..4
    nb(2) = 9
    assert(Variant.decode(m, nb).isEmpty, "id out of range")
    // unsorted fields: swap first two ids
    val ub = b.clone()
    val t = ub(2); ub(2) = ub(3); ub(3) = t
    assert(Variant.decode(m, ub).isEmpty, "unsorted object")
    // unknown primitive ids refuse (date 11 / timestamp 12 / float
    // 14 / binary 15 / uuid 20 are not carried by this v1)
    for (id <- Seq(11, 12, 13, 14, 15, 17, 20, 63)) {
      val (em, _) = Variant.encode(VNull)
      assert(Variant.decode(em,
        Array[Byte]((id << 2).toByte, 0, 0, 0, 0, 0, 0, 0, 0))
        .isEmpty, s"type id $id")
    }
    // a decimal with an absurd scale refuses
    val (em, _) = Variant.encode(VNull)
    assert(Variant.decode(em,
      Array[Byte]((8 << 2).toByte, 99, 1, 0, 0, 0)).isEmpty,
      "scale > 38")
  }
}
