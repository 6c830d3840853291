package graft

import graft.sources.{AvroGeneric, AvroResolve, AvroWrite}
import graft.sources.AvroGeneric._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Avro schema resolution (q366): reader-vs-writer evolution per
  * the Avro 1.11 spec — field matching by name with reader aliases,
  * reader-side defaults for writer-missing fields, numeric and
  * string/bytes promotions, enum resolution with the ≥1.9 enum
  * default, union branch selection (exact before promotion), and
  * fail-CLOSED behavior on genuinely incompatible pairs. Apache
  * Avro's own GenericDatumReader is run over the same (writer bytes,
  * reader schema) pairs as the independent referee.
  */
class AvroResolveSpec extends AnyFunSuite {

  private def apacheRead(bytes: Array[Byte], readerJson: String)
      : Vector[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val reader = new org.apache.avro.Schema.Parser().parse(readerJson)
    val rd = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](null, reader))
    val out = Vector.newBuilder[GenericRecord]
    while (rd.hasNext) out += rd.next()
    rd.close()
    out.result()
  }

  private val WriterV1 =
    """{"type":"record","name":"doc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":"string"},
      |{"name":"tmp","type":{"type":"array","items":"int"}},
      |{"name":"lang","type":["null","string"]}
      |]}""".stripMargin.replaceAll("\n", "")

  private def v1Records(n: Int): Seq[V] =
    (0 until n).map { i =>
      VRecord(Vector(
        "id" -> VLong(i.toLong),
        "name" -> VString(s"row-$i"),
        "tmp" -> VArray(Vector.tabulate(i % 3)(j => VLong(j.toLong))),
        "lang" -> (if (i % 4 == 0) VNull else VString("en"))))
    }

  private def v1Container(n: Int = 40): Array[Byte] =
    AvroWrite.container(WriterV1, v1Records(n), syncSeed = "resolve-v1",
      blockRecords = 16)

  test("field reordering, writer-only skip, reader defaults: an " +
    "evolved reader (reordered fields, tmp dropped, score added with " +
    "a default) reads v1 bytes; Apache Avro agrees value-for-value") {
    val readerJson =
      """{"type":"record","name":"doc","fields":[
        |{"name":"name","type":"string"},
        |{"name":"score","type":"double","default":1.5},
        |{"name":"id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null}
        |]}""".stripMargin.replaceAll("\n", "")
    val bytes = v1Container()
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("must resolve"))
    assert(dec.records.length == 40)
    // reader field ORDER, writer values, defaulted score
    dec.records.zipWithIndex.foreach { case (r, i) =>
      val VRecord(fs) = r: @unchecked
      assert(fs.map(_._1) == Vector("name", "score", "id", "lang"))
      assert(r.field("name").flatMap(_.asString).contains(s"row-$i"))
      assert(r.field("score").contains(VDouble(1.5)))
      assert(r.field("id").flatMap(_.asLong).contains(i.toLong))
      if (i % 4 == 0) assert(r.field("lang").contains(VNull))
      else assert(r.field("lang").flatMap(_.asString).contains("en"))
    }
    val ap = apacheRead(bytes, readerJson)
    assert(ap.length == 40)
    ap.zipWithIndex.foreach { case (r, i) =>
      assert(r.get("name").toString == s"row-$i")
      assert(r.get("score").asInstanceOf[Double] == 1.5)
      assert(r.get("id").asInstanceOf[Long] == i.toLong)
      if (i % 4 == 0) assert(r.get("lang") == null)
      else assert(r.get("lang").toString == "en")
    }
  }

  test("promotions: int->long/double, long->double, float->double, " +
    "string<->bytes; Apache Avro agrees") {
    val writerJson =
      """{"type":"record","name":"p","fields":[
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"f","type":"float"},
        |{"name":"s","type":"string"},
        |{"name":"b","type":"bytes"}
        |]}""".stripMargin.replaceAll("\n", "")
    val recs = (0 until 10).map { i =>
      val bb = Array.tabulate(3)(j => (i + j).toByte)
      VRecord(Vector(
        "i" -> VLong(i - 5L),
        "l" -> VLong(1L << (40 + i % 3)),
        "f" -> VDouble(0.25 * i),
        "s" -> VString(s"s$i"),
        "b" -> VBytes(bb.length, bb)))
    }
    val bytes = AvroWrite.container(writerJson, recs,
      syncSeed = "resolve-promo", blockRecords = 4)
    val readerJson =
      """{"type":"record","name":"p","fields":[
        |{"name":"i","type":"double"},
        |{"name":"l","type":"double"},
        |{"name":"f","type":"double"},
        |{"name":"s","type":"bytes"},
        |{"name":"b","type":"string"}
        |]}""".stripMargin.replaceAll("\n", "")
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("must resolve"))
    dec.records.zipWithIndex.foreach { case (r, i) =>
      assert(r.field("i").contains(VDouble((i - 5).toDouble)))
      assert(r.field("l").contains(
        VDouble((1L << (40 + i % 3)).toDouble)))
      assert(r.field("f").contains(VDouble(0.25 * i)))
      assert(r.field("s").flatMap(_.asBytes)
        .exists(_.sameElements(s"s$i".getBytes("UTF-8"))))
      assert(r.field("b").flatMap(_.asString).contains(
        new String(Array.tabulate(3)(j => (i + j).toByte), "UTF-8")))
    }
    val ap = apacheRead(bytes, readerJson)
    ap.zipWithIndex.foreach { case (r, i) =>
      assert(r.get("i").asInstanceOf[Double] == (i - 5).toDouble)
      assert(r.get("f").asInstanceOf[Double] == 0.25 * i)
      assert(r.get("b").toString == new String(
        Array.tabulate(3)(j => (i + j).toByte), "UTF-8"))
    }
    // int->long specifically (not just ->double)
    val readerLong =
      """{"type":"record","name":"p","fields":[
        |{"name":"i","type":"long"}]}"""
        .stripMargin.replaceAll("\n", "")
    val decL = AvroResolve.parseContainer(bytes, readerLong)
      .getOrElse(fail("int->long"))
    assert(decL.records(7).field("i").flatMap(_.asLong).contains(2L))
  }

  test("aliases: a renamed record and a renamed field resolve via " +
    "reader-side aliases (rename-without-rewrite); Apache agrees") {
    val readerJson =
      """{"type":"record","name":"document","aliases":["doc"],
        |"fields":[
        |{"name":"doc_id","type":"long","aliases":["id"]},
        |{"name":"title","type":"string","aliases":["name"]}
        |]}""".stripMargin.replaceAll("\n", "")
    val bytes = v1Container(12)
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("aliases must resolve"))
    dec.records.zipWithIndex.foreach { case (r, i) =>
      assert(r.field("doc_id").flatMap(_.asLong).contains(i.toLong))
      assert(r.field("title").flatMap(_.asString).contains(s"row-$i"))
    }
    val ap = apacheRead(bytes, readerJson)
    ap.zipWithIndex.foreach { case (r, i) =>
      assert(r.get("doc_id").asInstanceOf[Long] == i.toLong)
      assert(r.get("title").toString == s"row-$i")
    }
  }

  test("enum resolution: symbols map by NAME into the reader's " +
    "table; a writer symbol the reader lacks takes the reader enum " +
    "default, and is an error without one; Apache agrees") {
    val writerJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"e","type":{"type":"enum","name":"E",
        |"symbols":["A","B","C"]}}]}"""
        .stripMargin.replaceAll("\n", "")
    val recs = (0 until 9).map(i => VRecord(Vector("e" -> VEnum(i % 3))))
    val bytes = AvroWrite.container(writerJson, recs,
      syncSeed = "resolve-enum", blockRecords = 3)
    // reader reorders symbols and drops C behind a default
    val readerJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"e","type":{"type":"enum","name":"E",
        |"symbols":["OTHER","B","A"],"default":"OTHER"}}]}"""
        .stripMargin.replaceAll("\n", "")
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("enum must resolve"))
    val got = dec.records.map(_.field("e").get)
    // writer A->reader 2, B->1, C->default OTHER=0
    assert(got == Vector(2, 1, 0, 2, 1, 0, 2, 1, 0).map(VEnum(_)))
    val ap = apacheRead(bytes, readerJson)
    assert(ap.map(_.get("e").toString) ==
      Vector("A", "B", "OTHER", "A", "B", "OTHER", "A", "B", "OTHER"))
    // no default: fail closed
    val readerNoDflt =
      """{"type":"record","name":"r","fields":[
        |{"name":"e","type":{"type":"enum","name":"E",
        |"symbols":["A","B"]}}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(bytes, readerNoDflt).isEmpty)
  }

  test("unions: writer union vs evolved reader union; a non-union " +
    "writer against a reader union picks the EXACT branch over an " +
    "earlier promotion branch (Apache's best-match discipline)") {
    val writerJson =
      """{"type":"record","name":"u","fields":[
        |{"name":"v","type":["null","int"]},
        |{"name":"w","type":"int"}]}"""
        .stripMargin.replaceAll("\n", "")
    val recs = (0 until 8).map { i =>
      VRecord(Vector(
        "v" -> (if (i % 2 == 0) VNull else VLong(i.toLong)),
        "w" -> VLong(i.toLong)))
    }
    val bytes = AvroWrite.container(writerJson, recs,
      syncSeed = "resolve-union", blockRecords = 4)
    // reader widens v's int branch to long and adds a string branch;
    // w becomes a union [double, int] — int must win (exact)
    val readerJson =
      """{"type":"record","name":"u","fields":[
        |{"name":"v","type":["null","long","string"]},
        |{"name":"w","type":["double","int"]}]}"""
        .stripMargin.replaceAll("\n", "")
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("union must resolve"))
    dec.records.zipWithIndex.foreach { case (r, i) =>
      if (i % 2 == 0) assert(r.field("v").contains(VNull))
      else assert(r.field("v").flatMap(_.asLong).contains(i.toLong))
      assert(r.field("w").contains(VLong(i.toLong)),
        "exact int branch must beat the earlier double branch")
    }
    val ap = apacheRead(bytes, readerJson)
    ap.zipWithIndex.foreach { case (r, i) =>
      assert(r.get("w").isInstanceOf[java.lang.Integer],
        "Apache picks the exact int branch too")
      if (i % 2 != 0)
        assert(r.get("v").asInstanceOf[Long] == i.toLong)
    }
  }

  test("incompatible pairs fail CLOSED: narrowing, a missing field " +
    "without default, record name mismatch, fixed size mismatch") {
    val bytes = v1Container(6)
    // long id -> int reader: narrowing is NOT a promotion
    val narrow =
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"int"}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(bytes, narrow).isEmpty)
    // reader-only field with no default
    val noDflt =
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"brand_new","type":"string"}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(bytes, noDflt).isEmpty)
    // record name mismatch without an alias
    val wrongName =
      """{"type":"record","name":"other","fields":[
        |{"name":"id","type":"long"}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(bytes, wrongName).isEmpty)
    // fixed size mismatch
    val writerFx =
      """{"type":"record","name":"fx","fields":[
        |{"name":"h","type":{"type":"fixed","name":"H","size":4}}]}"""
        .stripMargin.replaceAll("\n", "")
    val fxRecs = (0 until 3).map { i =>
      val h = Array.tabulate(4)(j => (i * 4 + j).toByte)
      VRecord(Vector("h" -> VBytes(4, h)))
    }
    val fxBytes = AvroWrite.container(writerFx, fxRecs,
      syncSeed = "resolve-fixed")
    val fxReaderBad =
      """{"type":"record","name":"fx","fields":[
        |{"name":"h","type":{"type":"fixed","name":"H","size":8}}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(fxBytes, fxReaderBad).isEmpty)
    val fxReaderOk =
      """{"type":"record","name":"fx","fields":[
        |{"name":"h","type":{"type":"fixed","name":"H","size":4}}]}"""
        .stripMargin.replaceAll("\n", "")
    assert(AvroResolve.parseContainer(fxBytes, fxReaderOk).nonEmpty)
  }

  test("identity resolution: reader == writer reproduces the strict " +
    "generic walk exactly (nested arrays, unions, nulls)") {
    val bytes = v1Container(25)
    val strict = AvroGeneric.parseContainer(bytes)
      .getOrElse(fail("strict"))
    val resolved = AvroResolve.parseContainer(bytes, WriterV1)
      .getOrElse(fail("resolved"))
    assert(resolved.records == strict.records)
    assert(resolved.schemaJson == strict.schemaJson)
  }

  test("record defaults for complex reader fields: array, map, and " +
    "nested-record defaults materialize from their JSON form") {
    val readerJson =
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tags","type":{"type":"array","items":"string"},
        |"default":["a","b"]},
        |{"name":"attrs","type":{"type":"map","values":"long"},
        |"default":{"k":7}},
        |{"name":"geo","type":{"type":"record","name":"g","fields":[
        |{"name":"lat","type":"double"},
        |{"name":"lon","type":"double"}]},
        |"default":{"lat":0.5,"lon":-1.5}}
        |]}""".stripMargin.replaceAll("\n", "")
    val bytes = v1Container(4)
    val dec = AvroResolve.parseContainer(bytes, readerJson)
      .getOrElse(fail("complex defaults must resolve"))
    val r = dec.records.head
    assert(r.field("tags").contains(
      VArray(Vector(VString("a"), VString("b")))))
    assert(r.field("attrs").contains(VMap(Vector("k" -> VLong(7)))))
    assert(r.field("geo").contains(VRecord(Vector(
      "lat" -> VDouble(0.5), "lon" -> VDouble(-1.5)))))
    val ap = apacheRead(bytes, readerJson)
    assert(ap.head.get("tags")
      .asInstanceOf[java.util.Collection[_]].size == 2)
  }
}
