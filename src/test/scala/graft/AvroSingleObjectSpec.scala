package graft

import graft.sources.{AvroGeneric, AvroSingleObject => SO}
import graft.sources.AvroGeneric._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Avro single-object encoding (q373): Parsing Canonical Form
  * and CRC-64-AVRO fingerprints byte-identical to Apache Avro's own
  * SchemaNormalization across the schema battery, the C3 01 wire
  * framing, registry dispatch with reader-schema resolution, and
  * fail-closed behavior.
  */
class AvroSingleObjectSpec extends AnyFunSuite {

  private val battery = Seq(
    """"long"""",
    """{"type":"string"}""",
    """{"type":"array","items":"int"}""",
    """{"type":"map","values":["null","double"]}""",
    """{"type":"fixed","name":"H","size":16}""",
    """{"type":"enum","name":"E","symbols":["A","B","C"],"default":"A"}""",
    // record with doc/default/alias noise the PCF must strip, a
    // namespace to fold into fullnames, and a named-type re-use
    """{"type":"record","name":"doc","namespace":"com.example",
      |"doc":"noise","aliases":["old"],"fields":[
      |{"name":"id","type":"long","doc":"x"},
      |{"name":"h1","type":{"type":"fixed","name":"Hash","size":8}},
      |{"name":"h2","type":"Hash"},
      |{"name":"lang","type":["null","string"],"default":null},
      |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}}
      |]}""".stripMargin.replaceAll("\n", ""),
    // nested record
    """{"type":"record","name":"outer","fields":[
      |{"name":"inner","type":{"type":"record","name":"pt","fields":[
      |{"name":"x","type":"double"},{"name":"y","type":"double"}]}},
      |{"name":"tags","type":{"type":"array","items":"string"}}
      |]}""".stripMargin.replaceAll("\n", ""))

  test("Parsing Canonical Form and CRC-64-AVRO match Apache Avro's " +
    "SchemaNormalization across the battery") {
    import org.apache.avro.{Schema, SchemaNormalization}
    battery.foreach { js =>
      val apache = new Schema.Parser().parse(js)
      val wantPcf = SchemaNormalization.toParsingForm(apache)
      val gotPcf = SO.parsingCanonicalForm(js)
        .getOrElse(fail(s"pcf must parse: $js"))
      assert(gotPcf == wantPcf, s"PCF mismatch for $js")
      val wantFp = SchemaNormalization.parsingFingerprint64(apache)
      val gotFp = SO.fingerprint(js).get
      assert(gotFp == wantFp, s"fingerprint mismatch for $js")
    }
  }

  private val V1 =
    """{"type":"record","name":"ev","fields":[
      |{"name":"id","type":"long"},
      |{"name":"amount","type":"int"}
      |]}""".stripMargin.replaceAll("\n", "")
  private val V2 =
    """{"type":"record","name":"ev","fields":[
      |{"name":"id","type":"long"},
      |{"name":"amount","type":"long"},
      |{"name":"source","type":"string","default":"s2"}
      |]}""".stripMargin.replaceAll("\n", "")
  private val Reader =
    """{"type":"record","name":"ev","fields":[
      |{"name":"id","type":"long"},
      |{"name":"amount","type":"long"},
      |{"name":"source","type":"string","default":"v1"}
      |]}""".stripMargin.replaceAll("\n", "")

  test("wire framing + registry dispatch: two writer versions decode " +
    "under ONE evolved reader (int->long promotion, defaulted " +
    "field), each through its fingerprint") {
    val registry = Map(
      SO.fingerprint(V1).get -> V1,
      SO.fingerprint(V2).get -> V2)
    assert(registry.size == 2, "distinct schemas, distinct prints")
    val m1 = SO.write(V1, VRecord(Vector(
      "id" -> VLong(7), "amount" -> VLong(40)))).get
    val m2 = SO.write(V2, VRecord(Vector(
      "id" -> VLong(8), "amount" -> VLong(1L << 40),
      "source" -> VString("k2")))).get
    assert((m1(0) & 0xff) == 0xc3 && m1(1) == 0x01)
    val r1 = SO.read(m1, registry, Reader).getOrElse(fail("r1"))
    assert(r1.field("id").flatMap(_.asLong).contains(7L))
    assert(r1.field("amount").flatMap(_.asLong).contains(40L))
    assert(r1.field("source").flatMap(_.asString).contains("v1"),
      "v1 messages take the reader default")
    val r2 = SO.read(m2, registry, Reader).getOrElse(fail("r2"))
    assert(r2.field("amount").flatMap(_.asLong).contains(1L << 40))
    assert(r2.field("source").flatMap(_.asString).contains("k2"))
  }

  test("fail closed: wrong marker, unknown fingerprint, trailing " +
    "bytes, unresolvable reader") {
    val registry = Map(SO.fingerprint(V1).get -> V1)
    val m = SO.write(V1, VRecord(Vector(
      "id" -> VLong(1), "amount" -> VLong(2)))).get
    val badMarker = m.clone(); badMarker(0) = 0x00
    assert(SO.read(badMarker, registry, Reader).isEmpty)
    val badFp = m.clone(); badFp(5) = (badFp(5) ^ 0x01).toByte
    assert(SO.read(badFp, registry, Reader).isEmpty)
    assert(SO.read(m :+ 0x00.toByte, registry, Reader).isEmpty,
      "trailing bytes must close")
    val narrow =
      """{"type":"record","name":"ev","fields":[
        |{"name":"id","type":"long"},
        |{"name":"amount","type":"int"},
        |{"name":"brand_new","type":"string"}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(SO.read(m, registry, narrow).isEmpty,
      "reader-only field without default must close")
    assert(SO.read(Array[Byte](0xc3.toByte, 0x01), registry,
      Reader).isEmpty)
  }

  test("a 10-byte message is valid: marker + fingerprint + a " +
    "zero-byte datum (empty record) round-trips (r16 ADVICE)") {
    val empty = """{"type":"record","name":"e","fields":[]}"""
    val reg = Map(SO.fingerprint(empty).get -> empty)
    val m = SO.write(empty, VRecord(Vector.empty)).get
    assert(m.length == 10, "empty record datum is zero bytes")
    val r = SO.read(m, reg, empty).getOrElse(fail("10-byte read"))
    assert(r.isInstanceOf[VRecord])
    // but 9 bytes (truncated fingerprint) still closes
    assert(SO.read(m.dropRight(1), reg, empty).isEmpty)
  }

  test("fingerprints are PCF-invariant: doc/alias/default/logical " +
    "noise and whitespace do not change the fingerprint; a real " +
    "field change does") {
    val noisy =
      """{ "type" : "record", "name" : "ev", "doc": "hi",
        |"fields" : [ {"name":"id","type":"long","doc":"d"},
        |{"name":"amount","type":{"type":"int","logicalType":"date"}} ] }"""
        .stripMargin.replaceAll("\n", "")
    assert(SO.fingerprint(noisy) == SO.fingerprint(V1))
    assert(SO.fingerprint(V1) != SO.fingerprint(V2))
    // CRC-64-AVRO reference vector: fingerprint of "\"long\"" pins
    // the table itself against Apache
    import org.apache.avro.{Schema, SchemaNormalization}
    val lng = new Schema.Parser().parse(""""long"""")
    assert(SO.crc64("\"long\"".getBytes("UTF-8")) ==
      SchemaNormalization.parsingFingerprint64(lng))
  }

  test("container-written records re-encode as single objects and " +
    "round-trip value-exactly (the transport twin of the container)") {
    val recs = (0 until 20).map(i => VRecord(Vector(
      "id" -> VLong(i.toLong), "amount" -> VLong(i * 3L))))
    val registry = Map(SO.fingerprint(V1).get -> V1)
    recs.foreach { r =>
      val m = SO.write(V1, r).get
      val back = SO.read(m, registry, V1).get
      assert(back == r)
    }
  }
}
