package graft.sources

/** Schema-driven Avro WRITE twin of [[AvroGeneric.parseContainer]]:
  * encodes a value tree ([[AvroGeneric.V]]) against a schema tree
  * ([[AvroGeneric.Schema]]) datum by datum — zigzag varints, IEEE LE
  * floats, single-block arrays/maps, union branch dispatch by value
  * shape — and frames records into an RFC-shaped object container
  * (Obj\1 magic, avro.schema/avro.codec metadata map, deterministic
  * md5 sync marker, per-block count/size/sync). Codecs are all
  * ENGINE-OWNED: `deflate` via [[Deflate.compress]] (raw deflate,
  * best-of fixed/dynamic — q333), `snappy` via [[Snappy.compress]]
  * plus the BE CRC32-of-plaintext suffix Avro specifies, `zstandard`
  * via [[ZstdEncode.compress]].
  *
  * The layout is deterministic (sync = md5 of a caller seed), the
  * engine's own generic walk decodes it back, and Apache avro (the
  * Java reference implementation, on the Spark classpath) cross-reads
  * it in AvroGenericSpec — closing the Avro container on BOTH ends
  * the way parquet (q310) and ORC (q311) already are.
  *
  * Spec source: the Avro 1.12 specification, "Object Container Files"
  * and "Binary Encoding".
  */
object AvroWrite {

  import AvroGeneric._

  private final class Damage
    extends RuntimeException(null, null, false, false)
  private def damage(): Nothing = throw new Damage

  /** Avro `decimal` logical-type payload: the unscaled value as
    * minimal-length BIG-ENDIAN two's complement (Avro spec §Logical
    * Types) — the sign bit must survive, so a positive value whose
    * top byte has bit 7 set gains a 0x00 prefix and negatives carry
    * 0xff sign extension only as far as needed.
    */
  def decimalBytes(unscaled: Long): Array[Byte] = {
    var n = 1
    while (n < 8) {
      // does the value fit n bytes of two's complement?
      val shifted = unscaled >> (8 * n - 1)
      if (shifted == 0L || shifted == -1L) {
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          out(n - 1 - i) = ((unscaled >> (8 * i)) & 0xff).toByte
          i += 1
        }
        return out
      }
      n += 1
    }
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(7 - i) = ((unscaled >> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  private def zigzag(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7
    }
    out.write(z.toInt)
  }

  private def utf8(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    zigzag(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** Does `v` fit `schema`? (union branch dispatch — first match in
    * branch order wins, the ["null", T] convention.)
    */
  private def fits(v: V, schema: Schema): Boolean = (schema, v) match {
    case (SNull, VNull) => true
    case (SBool, _: VBool) => true
    case (SInt | SLong, _: VLong) => true
    case (SFloat | SDouble, _: VDouble) => true
    case (SBytes, _: VBytes) => true
    case (SString, _: VString) => true
    case (_: SEnum, _: VEnum) => true
    case (_: SFixed, _: VBytes) => true
    case (_: SRecord, _: VRecord) => true
    case (_: SArray, _: VArray) => true
    case (_: SMap, _: VMap) => true
    case (r: SRef, _) => r.named.get(r.name).exists(fits(v, _))
    case (SUnion(bs), _) => bs.exists(fits(v, _))
    case _ => false
  }

  /** Encode one datum; throws Damage on any value/schema mismatch so
    * a writer bug can never ship silently mis-typed bytes.
    */
  def datum(out: java.io.ByteArrayOutputStream, v: V,
            schema: Schema): Unit = (schema, v) match {
    case (SNull, VNull) => ()
    case (SBool, VBool(x)) => out.write(if (x) 1 else 0)
    case (SInt | SLong, VLong(x)) => zigzag(out, x)
    case (SFloat, VDouble(x)) =>
      val bits = java.lang.Float.floatToIntBits(x.toFloat)
      out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
      out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
    case (SDouble, VDouble(x)) =>
      var bits = java.lang.Double.doubleToLongBits(x)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    case (SBytes, VBytes(n, content)) =>
      if (content == null || content.length != n) damage()
      zigzag(out, n.toLong)
      out.write(content, 0, n)
    case (SString, VString(s)) => utf8(out, s)
    case (SEnum(_, n), VEnum(i)) =>
      if (i < 0 || i >= n) damage()
      zigzag(out, i.toLong)
    case (SFixed(_, size), VBytes(n, content)) =>
      if (content == null || n != size || content.length != size) damage()
      out.write(content, 0, size)
    case (SRecord(_, fields), VRecord(vals)) =>
      if (fields.length != vals.length) damage()
      var i = 0
      while (i < fields.length) {
        if (fields(i)._1 != vals(i)._1) damage()
        datum(out, vals(i)._2, fields(i)._2)
        i += 1
      }
    case (SArray(items), VArray(xs)) =>
      if (xs.nonEmpty) {
        zigzag(out, xs.length.toLong)
        xs.foreach(datum(out, _, items))
      }
      zigzag(out, 0L)
    case (SMap(values), VMap(entries)) =>
      if (entries.nonEmpty) {
        zigzag(out, entries.length.toLong)
        entries.foreach { case (k, ev) =>
          utf8(out, k)
          datum(out, ev, values)
        }
      }
      zigzag(out, 0L)
    case (SUnion(branches), _) =>
      val bi = branches.indexWhere(fits(v, _))
      if (bi < 0) damage()
      zigzag(out, bi.toLong)
      datum(out, v, branches(bi))
    case (r: SRef, _) =>
      datum(out, v, r.named.getOrElse(r.name, damage()))
    case _ => damage()
  }

  /** Write one object container: `records` of the schema embedded in
    * `schemaJson`, `blockRecords` records per block, codec one of
    * null / deflate / snappy / zstandard / bzip2 / xz — the FULL
    * Avro-spec codec table, every one an engine-owned encoder.
    * `syncSeed` makes the 16-byte sync marker deterministic (md5),
    * so same inputs always produce the same bytes.
    */
  def container(schemaJson: String, records: Seq[V],
                codec: String = "null",
                syncSeed: String = "graft-avro",
                blockRecords: Int = 1000): Array[Byte] = {
    require(codec == "null" || codec == "deflate" || codec == "snappy" ||
      codec == "zstandard" || codec == "bzip2" || codec == "xz",
      s"codec $codec")
    require(blockRecords >= 1)
    val schema = AvroGeneric.parseSchema(schemaJson)
      .getOrElse(throw new IllegalArgumentException("bad schema"))
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    zigzag(out, 2L) // metadata map: one block of two entries
    utf8(out, "avro.schema"); utf8(out, schemaJson)
    utf8(out, "avro.codec"); utf8(out, codec)
    zigzag(out, 0L) // map end
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(("sync:" + syncSeed).getBytes("UTF-8"))
    out.write(sync, 0, 16)
    records.grouped(blockRecords).foreach { chunk =>
      val raw = new java.io.ByteArrayOutputStream()
      chunk.foreach(datum(raw, _, schema))
      val plain = raw.toByteArray
      val body = codec match {
        case "deflate" => Deflate.compress(plain)
        case "snappy" =>
          val comp = Snappy.compress(plain)
          val crc = new java.util.zip.CRC32
          crc.update(plain)
          val c = crc.getValue
          comp ++ Array[Byte](((c >> 24) & 0xff).toByte,
            ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte,
            (c & 0xff).toByte)
        case "zstandard" => ZstdEncode.compress(plain)
        case "bzip2" => Bzip2Encode.compress(plain, level = 1)
        case "xz" => LzmaEncode.xz(plain)
        case _ => plain
      }
      zigzag(out, chunk.length.toLong)
      zigzag(out, body.length.toLong)
      out.write(body, 0, body.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }
}
