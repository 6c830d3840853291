package graft.sources

/** The VARIANT binary encoding (the public parquet
  * VariantEncoding.md — the column type Iceberg v3, Delta, and
  * Spark 4 share for semi-structured values): a value is a PAIR of
  * blobs,
  *
  *   metadata — header byte (version 1 in bits 0-3, sorted_strings
  *              bit 4, offset_size-1 in bits 6-7), dictionary size,
  *              size+1 offsets, concatenated UTF-8 key strings
  *   value    — first byte carries basic_type (bits 0-1) +
  *              value_header (bits 2-7):
  *                0 primitive — header is the type id (null / true /
  *                  false / int8,16,32,64 / double / decimal4,8,16 /
  *                  long string)
  *                1 short string — header is the length (< 64)
  *                2 object — header packs is_large, field_id_size-1,
  *                  field_offset_size-1; then count, field ids
  *                  (dictionary indexes, SORTED by key string),
  *                  offsets, concatenated field values
  *                3 array — is_large, offset_size-1; count, offsets,
  *                  values
  *
  * This writer is CANONICAL: smallest integer/decimal width,
  * short-string form whenever the length fits, sorted dictionary
  * (sorted_strings = 1) and sorted object fields, minimal id/offset
  * widths — so re-encoding a decoded value is byte-identical and
  * blob equality is value equality.
  *
  * Totality law (decode): wrong version, truncation anywhere,
  * non-monotonic dictionary or field offsets, a field id past the
  * dictionary, unsorted object fields, trailing bytes, a type id
  * this v1 does not carry (date/timestamp/float/binary/uuid) — None,
  * never a throw and never a guess. VariantSpec cross-pins BOTH
  * directions against Spark's own reference implementation
  * (org.apache.spark.types.variant.{Variant, VariantBuilder}).
  */
object Variant {

  sealed trait V
  case object VNull extends V
  final case class VBool(v: Boolean) extends V
  final case class VLong(v: Long) extends V
  final case class VDouble(v: Double) extends V
  final case class VDecimal(unscaled: BigInt, scale: Int) extends V
  final case class VString(v: String) extends V
  final case class VObject(fields: Vector[(String, V)]) extends V
  final case class VArray(items: Vector[V]) extends V

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  // ---- encode ---------------------------------------------------------------

  private def keysOf(v: V, out: collection.mutable.Set[String])
      : Unit = v match {
    case VObject(fs) =>
      fs.foreach { case (k, x) => out += k; keysOf(x, out) }
    case VArray(xs) => xs.foreach(keysOf(_, out))
    case _ => ()
  }

  /** Lexicographic order of the UTF-8 BYTES (the spec's object-field
    * sort — identical to code-point order, which String.compareTo is
    * NOT for supplementary characters).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(Utf8)
    val y = b.getBytes(Utf8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def widthFor(maxValue: Long): Int =
    if (maxValue <= 0xffL) 1
    else if (maxValue <= 0xffffL) 2
    else if (maxValue <= 0xffffffL) 3
    else 4

  private def writeLe(out: java.io.ByteArrayOutputStream,
                      v: Long, n: Int): Unit = {
    var i = 0
    var x = v
    while (i < n) { out.write((x & 0xff).toInt); x >>= 8; i += 1 }
  }

  /** Encode to the canonical (metadata, value) pair. */
  def encode(v: V): (Array[Byte], Array[Byte]) = {
    val keySet = collection.mutable.Set.empty[String]
    keysOf(v, keySet)
    val keys = keySet.toVector.sorted
    val keyId = keys.zipWithIndex.toMap
    val keyBytes = keys.map(_.getBytes(Utf8))
    val totalKeyBytes = keyBytes.map(_.length.toLong).sum
    val offSize = widthFor(math.max(totalKeyBytes, keys.length.toLong))
    val meta = new java.io.ByteArrayOutputStream()
    meta.write(0x01 | 0x10 | ((offSize - 1) << 6)) // v1, sorted
    writeLe(meta, keys.length.toLong, offSize)
    var off = 0L
    writeLe(meta, 0L, offSize)
    keyBytes.foreach { kb =>
      off += kb.length
      writeLe(meta, off, offSize)
    }
    keyBytes.foreach(kb => meta.write(kb, 0, kb.length))
    val value = new java.io.ByteArrayOutputStream()
    encodeValue(v, keyId, value)
    (meta.toByteArray, value.toByteArray)
  }

  private def encodeValue(v: V, keyId: Map[String, Int],
                          out: java.io.ByteArrayOutputStream): Unit =
    v match {
      case VNull => out.write(0 << 2)
      case VBool(true) => out.write(1 << 2)
      case VBool(false) => out.write(2 << 2)
      case VLong(x) =>
        if (x >= Byte.MinValue && x <= Byte.MaxValue) {
          out.write(3 << 2); writeLe(out, x, 1)
        } else if (x >= Short.MinValue && x <= Short.MaxValue) {
          out.write(4 << 2); writeLe(out, x, 2)
        } else if (x >= Int.MinValue && x <= Int.MaxValue) {
          out.write(5 << 2); writeLe(out, x, 4)
        } else { out.write(6 << 2); writeLe(out, x, 8) }
      case VDouble(x) =>
        out.write(7 << 2)
        writeLe(out, java.lang.Double.doubleToLongBits(x), 8)
      case VDecimal(u, scale) =>
        require(scale >= 0 && scale <= 38)
        if (u.bitLength < 32) {
          out.write(8 << 2); out.write(scale)
          writeLe(out, u.longValue, 4)
        } else if (u.bitLength < 64) {
          out.write(9 << 2); out.write(scale)
          writeLe(out, u.longValue, 8)
        } else {
          require(u.bitLength < 128, "decimal16 overflow")
          out.write(10 << 2); out.write(scale)
          val b = u.toByteArray // BE two's complement
          var i = b.length - 1
          while (i >= 0) { out.write(b(i)); i -= 1 }
          val pad = if (u.signum < 0) 0xff else 0x00
          var k = b.length
          while (k < 16) { out.write(pad); k += 1 }
        }
      case VString(s) =>
        val b = s.getBytes(Utf8)
        if (b.length < 64) {
          out.write((b.length << 2) | 1)
          out.write(b, 0, b.length)
        } else {
          out.write(16 << 2)
          writeLe(out, b.length.toLong, 4)
          out.write(b, 0, b.length)
        }
      case VObject(fields) =>
        val sorted = fields.sortWith((a, b) => utf8Less(a._1, b._1))
        require(sorted.map(_._1).distinct.length == sorted.length,
          "duplicate object keys")
        val encoded = sorted.map { case (_, x) =>
          val b = new java.io.ByteArrayOutputStream()
          encodeValue(x, keyId, b)
          b.toByteArray
        }
        val total = encoded.map(_.length.toLong).sum
        val ids = sorted.map(f => keyId(f._1))
        val idSize = widthFor(if (ids.isEmpty) 0 else ids.max.toLong)
        val offSize = widthFor(total)
        val isLarge = sorted.length > 255
        out.write((((if (isLarge) 1 else 0) << 4) |
          ((idSize - 1) << 2) | (offSize - 1)) << 2 | 2)
        writeLe(out, sorted.length.toLong, if (isLarge) 4 else 1)
        ids.foreach(writeLe(out, _, idSize))
        var off = 0L
        writeLe(out, 0L, offSize)
        encoded.foreach { e =>
          off += e.length; writeLe(out, off, offSize) }
        encoded.foreach(e => out.write(e, 0, e.length))
      case VArray(items) =>
        val encoded = items.map { x =>
          val b = new java.io.ByteArrayOutputStream()
          encodeValue(x, keyId, b)
          b.toByteArray
        }
        val total = encoded.map(_.length.toLong).sum
        val offSize = widthFor(total)
        val isLarge = items.length > 255
        out.write((((if (isLarge) 1 else 0) << 2) |
          (offSize - 1)) << 2 | 3)
        writeLe(out, items.length.toLong, if (isLarge) 4 else 1)
        var off = 0L
        writeLe(out, 0L, offSize)
        encoded.foreach { e =>
          off += e.length; writeLe(out, off, offSize) }
        encoded.foreach(e => out.write(e, 0, e.length))
    }

  // ---- decode ---------------------------------------------------------------

  /** Parse the metadata dictionary. None on version/shape damage. */
  def parseMetadata(meta: Array[Byte]): Option[Vector[String]] = {
    if (meta.length < 1) return None
    val h = meta(0) & 0xff
    if ((h & 0x0f) != 1) return None // version
    if ((h & 0x20) != 0) return None // reserved bit
    val offSize = ((h >>> 6) & 0x03) + 1
    def le(p: Int, n: Int): Long = {
      var v = 0L
      var i = n - 1
      while (i >= 0) { v = (v << 8) | (meta(p + i) & 0xffL); i -= 1 }
      v
    }
    if (meta.length < 1 + offSize) return None
    val n = le(1, offSize)
    if (n < 0 || n > Int.MaxValue / 8) return None
    val offBase = 1 + offSize
    val strBase = offBase + (n.toInt + 1) * offSize
    if (strBase.toLong > meta.length) return None
    val offs = (0 to n.toInt).map(i => le(offBase + i * offSize,
      offSize))
    if (offs.head != 0L) return None
    if (offs.zip(offs.tail).exists { case (a, b) => b < a })
      return None
    if (strBase + offs.last > meta.length) return None
    if (strBase + offs.last != meta.length) return None // trailing
    Some((0 until n.toInt).map(i =>
      new String(meta, strBase + offs(i).toInt,
        (offs(i + 1) - offs(i)).toInt, Utf8)).toVector)
  }

  /** Decode the pair. None on ANY malformation (object docs). */
  def decode(meta: Array[Byte], value: Array[Byte]): Option[V] =
    for {
      dict <- parseMetadata(meta)
      (v, used) <- decodeValue(value, 0, dict)
      if used == value.length // no trailing bytes
    } yield v

  private def decodeValue(b: Array[Byte], pos: Int,
                          dict: Vector[String])
      : Option[(V, Int)] = {
    if (pos >= b.length) return None
    def le(p: Int, n: Int): Option[Long] =
      if (p + n > b.length) None
      else {
        var v = 0L
        var i = n - 1
        while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
        Some(v)
      }
    def leSigned(p: Int, n: Int): Option[Long] =
      le(p, n).map(v => (v << (64 - 8 * n)) >> (64 - 8 * n))
    val first = b(pos) & 0xff
    val basic = first & 0x03
    val header = first >>> 2
    basic match {
      case 0 => // primitive
        header match {
          case 0 => Some((VNull, pos + 1))
          case 1 => Some((VBool(true), pos + 1))
          case 2 => Some((VBool(false), pos + 1))
          case 3 => leSigned(pos + 1, 1).map(x =>
            (VLong(x), pos + 2))
          case 4 => leSigned(pos + 1, 2).map(x =>
            (VLong(x), pos + 3))
          case 5 => leSigned(pos + 1, 4).map(x =>
            (VLong(x), pos + 5))
          case 6 => leSigned(pos + 1, 8).map(x =>
            (VLong(x), pos + 9))
          case 7 => le(pos + 1, 8).map(x =>
            (VDouble(java.lang.Double.longBitsToDouble(x)),
              pos + 9))
          case 8 | 9 => // decimal4 / decimal8
            val n = if (header == 8) 4 else 8
            if (pos + 2 + n > b.length) None
            else {
              val scale = b(pos + 1) & 0xff
              if (scale > 38) None
              else leSigned(pos + 2, n).map(u =>
                (VDecimal(BigInt(u), scale), pos + 2 + n))
            }
          case 10 => // decimal16: 16 bytes LE two's complement
            if (pos + 18 > b.length) None
            else {
              val scale = b(pos + 1) & 0xff
              if (scale > 38) None
              else {
                val be = new Array[Byte](16)
                var i = 0
                while (i < 16) {
                  be(i) = b(pos + 2 + 15 - i); i += 1 }
                Some((VDecimal(BigInt(be), scale), pos + 18))
              }
            }
          case 16 => // long string
            le(pos + 1, 4).flatMap { n =>
              if (n < 0 || pos + 5 + n > b.length) None
              else Some((VString(new String(b, pos + 5, n.toInt,
                Utf8)), pos + 5 + n.toInt))
            }
          case _ => None // a type this v1 does not carry: refuse
        }
      case 1 => // short string
        val n = header
        if (pos + 1 + n > b.length) None
        else Some((VString(new String(b, pos + 1, n, Utf8)),
          pos + 1 + n))
      case 2 => // object
        val isLarge = (header & 0x10) != 0
        val idSize = ((header >>> 2) & 0x03) + 1
        val offSize = (header & 0x03) + 1
        val szBytes = if (isLarge) 4 else 1
        for {
          n0 <- le(pos + 1, szBytes)
          n = n0.toInt
          if n0 >= 0 && n0 <= Int.MaxValue / 8
          idBase = pos + 1 + szBytes
          offBase = idBase + n * idSize
          valBase = offBase + (n + 1) * offSize
          if valBase.toLong <= b.length
          ids <- {
            val xs = (0 until n).map(i => le(idBase + i * idSize,
              idSize))
            if (xs.exists(_.isEmpty)) None
            else {
              val v = xs.map(_.get)
              if (v.exists(_ >= dict.length)) None
              // the spec's sort law: fields strictly ascending by
              // the KEY's UTF-8 bytes (binary search depends on it)
              else if (v.map(i => dict(i.toInt))
                .sliding(2).exists(p => p.length == 2 &&
                  !utf8Less(p(0), p(1)))) None
              else Some(v.map(_.toInt))
            }
          }
          offs <- {
            // per-field offsets are POINTERS into the data region
            // (a writer may keep values in insertion order while
            // ids sort — Spark does); only the LAST entry is the
            // size of the data region
            val xs = (0 to n).map(i => le(offBase + i * offSize,
              offSize))
            if (xs.exists(_.isEmpty)) None
            else {
              val v = xs.map(_.get)
              if (valBase + v.last > b.length ||
                v.exists(o => o < 0 || o > v.last)) None
              else Some(v)
            }
          }
          fields <- {
            var ok = true
            val out = Vector.newBuilder[(String, V)]
            var i = 0
            val limit = valBase + offs.last.toInt
            while (i < n && ok) {
              decodeValue(b, valBase + offs(i).toInt, dict) match {
                case Some((v, end)) if end <= limit =>
                  out += ((dict(ids(i)), v))
                case _ => ok = false
              }
              i += 1
            }
            if (ok) Some(out.result()) else None
          }
        } yield (VObject(fields), valBase + offs.last.toInt)
      case 3 => // array
        val isLarge = (header & 0x04) != 0
        val offSize = (header & 0x03) + 1
        val szBytes = if (isLarge) 4 else 1
        for {
          n0 <- le(pos + 1, szBytes)
          n = n0.toInt
          if n0 >= 0 && n0 <= Int.MaxValue / 8
          offBase = pos + 1 + szBytes
          valBase = offBase + (n + 1) * offSize
          if valBase.toLong <= b.length
          offs <- {
            val xs = (0 to n).map(i => le(offBase + i * offSize,
              offSize))
            if (xs.exists(_.isEmpty)) None
            else {
              val v = xs.map(_.get)
              if (v.head != 0L ||
                v.zip(v.tail).exists { case (a, c) => c < a } ||
                valBase + v.last > b.length) None
              else Some(v)
            }
          }
          items <- {
            var ok = true
            val out = Vector.newBuilder[V]
            var i = 0
            while (i < n && ok) {
              decodeValue(b, valBase + offs(i).toInt, dict) match {
                case Some((v, end))
                  if end == valBase + offs(i + 1).toInt =>
                  out += v
                case _ => ok = false
              }
              i += 1
            }
            if (ok) Some(out.result()) else None
          }
        } yield (VArray(items), valBase + offs.last.toInt)
      case _ => None
    }
  }

  /** Extract one top-level object field WITHOUT decoding siblings —
    * the unshredded-scan path: binary-search the SORTED field ids
    * (the canonical law makes the search sound), decode only the
    * hit. None when the value is not an object, the field is
    * absent, or any walked byte is malformed.
    */
  def getField(meta: Array[Byte], value: Array[Byte],
               name: String): Option[V] =
    for {
      dict <- parseMetadata(meta)
      v <- {
        if (value.isEmpty || (value(0) & 0x03) != 2) None
        else {
          val header = (value(0) & 0xff) >>> 2
          val isLarge = (header & 0x10) != 0
          val idSize = ((header >>> 2) & 0x03) + 1
          val offSize = (header & 0x03) + 1
          val szBytes = if (isLarge) 4 else 1
          def le(p: Int, n: Int): Option[Long] =
            if (p + n > value.length) None
            else {
              var x = 0L
              var i = n - 1
              while (i >= 0) {
                x = (x << 8) | (value(p + i) & 0xffL); i -= 1 }
              Some(x)
            }
          for {
            n0 <- le(1, szBytes)
            n = n0.toInt
            if n0 >= 0 && n0 <= Int.MaxValue / 8
            idBase = 1 + szBytes
            offBase = idBase + n * idSize
            valBase = offBase + (n + 1) * offSize
            if valBase.toLong <= value.length
            hit <- {
              // binary search over ids by the key's UTF-8 bytes
              // (the spec's sort order — the sort law makes it
              // sound)
              var lo = 0
              var hi = n - 1
              var found = -1
              var ok = true
              while (lo <= hi && found < 0 && ok) {
                val mid = (lo + hi) >>> 1
                le(idBase + mid * idSize, idSize) match {
                  case Some(id) if id < dict.length =>
                    val k = dict(id.toInt)
                    if (k == name) found = mid
                    else if (utf8Less(k, name)) lo = mid + 1
                    else hi = mid - 1
                  case _ => ok = false
                }
              }
              if (!ok) None
              else if (found < 0) None
              else Some(found)
            }
            o1 <- le(offBase + hit * offSize, offSize)
            oEnd <- le(offBase + n * offSize, offSize)
            if o1 >= 0 && o1 <= oEnd &&
              valBase + oEnd <= value.length
            r <- decodeValue(value, valBase + o1.toInt, dict)
            if r._2 <= valBase + oEnd.toInt
          } yield r._1
        }
      }
    } yield v
}
