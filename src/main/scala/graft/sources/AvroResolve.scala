package graft.sources

import graft.sources.Json._

/** Avro SCHEMA RESOLUTION (reader-vs-writer evolution) from the
  * public Avro 1.11 spec's "Schema Resolution" section — the rules a
  * long-lived ingest pipeline leans on when today's reader schema
  * opens years-old containers:
  *
  *  - record fields are matched by NAME (with reader-side `aliases`),
  *    not position: writer-only fields are skipped over in the byte
  *    stream, reader-only fields materialize their declared `default`
  *    (it is an error if they have none) — the lakehouse twin of the
  *    reference's `verify_columns` contract check
  *    (import_files_to_postgre.py:67-73, null-column injection at
  *    :83-89: a missing optional column takes its default);
  *  - numeric promotions: writer int → long/float/double, long →
  *    float/double, float → double; string ↔ bytes;
  *  - enums resolve writer symbols into the reader's symbol table by
  *    NAME; a symbol the reader lacks takes the reader enum's
  *    `default` (spec ≥1.9), else the pair is incompatible;
  *  - unions: a writer union reads its branch index then resolves
  *    that branch against the reader schema; a reader union picks its
  *    FIRST matching branch (exact-type pass before the promotion
  *    pass, mirroring the reference implementation's best-match
  *    discipline);
  *  - named types (record/enum/fixed) must match by name or via the
  *    reader's `aliases`; fixed additionally by size.
  *
  * Everything else — any structurally incompatible (writer, reader)
  * pair the data actually exercises — fails CLOSED: None, never a
  * throw, never a silently mis-typed value. Resolution happens while
  * walking the writer's bytes (Avro is not self-delimiting, so the
  * writer schema alone dictates the byte walk; the reader schema
  * dictates the VALUES), exactly the operational semantics of the
  * spec's resolution table.
  *
  * Values decode into [[AvroGeneric]]'s V tree so everything
  * downstream of the schema-strict reader works unchanged.
  */
object AvroResolve {

  import AvroGeneric.{V, VNull, VBool, VLong, VDouble, VBytes,
    VString, VEnum, VRecord, VArray, VMap}

  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  // ---- rich schema tree (defaults, aliases, symbols) ----------------------

  sealed trait S
  case object NullS extends S
  case object BoolS extends S
  case object IntS extends S
  case object LongS extends S
  case object FloatS extends S
  case object DoubleS extends S
  case object BytesS extends S
  case object StringS extends S
  final case class FieldS(name: String, aliases: Set[String],
                          schema: S, default: Option[JValue])
  final case class RecordS(name: String, aliases: Set[String],
                           fields: Vector[FieldS]) extends S
  final case class EnumS(name: String, aliases: Set[String],
                         symbols: Vector[String],
                         default: Option[String]) extends S
  final case class ArrayS(items: S) extends S
  final case class MapS(values: S) extends S
  final case class UnionS(branches: Vector[S]) extends S
  final case class FixedS(name: String, aliases: Set[String],
                          size: Int) extends S
  /** Lazy named-type indirection (recursive schemas) — resolves
    * through the shared name table at use time, as in
    * [[AvroGeneric.SRef]].
    */
  final case class RefS(name: String,
                        named: collection.Map[String, S]) extends S

  private def deref(s: S, depth: Int = 0): S = s match {
    case RefS(n, named) =>
      if (depth > 32) bad()
      deref(named.getOrElse(n, bad()), depth + 1)
    case other => other
  }

  /** Parse a schema JSON string into the rich tree. */
  def parseSchema(json: String): Option[S] =
    Json.parse(json).flatMap { j =>
      try {
        val named = scala.collection.mutable.Map.empty[String, S]
        Some(schemaOf(j, named, 0))
      } catch { case _: Bad => None }
    }

  private def aliasesOf(o: JObject): Set[String] =
    o.get("aliases") match {
      case Some(JArray(xs)) =>
        xs.map { case JString(a) => a; case _ => bad() }.toSet
      case None => Set.empty
      case _ => bad()
    }

  private def schemaOf(j: JValue,
                       named: scala.collection.mutable.Map[String, S],
                       depth: Int): S = {
    if (depth > 32) bad()
    j match {
      case JString(s) => primOrRef(s, named)
      case JArray(branches) =>
        UnionS(branches.map(schemaOf(_, named, depth + 1)))
      case o: JObject =>
        val t = o.get("type") match {
          case Some(JString(s)) => s
          case Some(inner @ (_: JObject | _: JArray)) =>
            return schemaOf(inner, named, depth + 1)
          case _ => bad()
        }
        t match {
          case "record" =>
            val name = o.get("name") match {
              case Some(JString(n)) => n; case _ => bad()
            }
            val fieldsJ = o.get("fields") match {
              case Some(JArray(fs)) => fs; case _ => bad()
            }
            named(name) = RefS(name, named)
            val fields = fieldsJ.map {
              case fo: JObject =>
                val fn = fo.get("name") match {
                  case Some(JString(n)) => n; case _ => bad()
                }
                val fs = schemaOf(fo.get("type").getOrElse(bad()),
                  named, depth + 1)
                FieldS(fn, aliasesOf(fo), fs, fo.get("default"))
              case _ => bad()
            }
            val full = RecordS(name, aliasesOf(o), fields)
            named(name) = full
            full
          case "enum" =>
            val name = o.get("name") match {
              case Some(JString(n)) => n; case _ => bad()
            }
            val symbols = o.get("symbols") match {
              case Some(JArray(ss)) => ss.map {
                case JString(x) => x; case _ => bad()
              }
              case _ => bad()
            }
            val dflt = o.get("default") match {
              case Some(JString(d)) =>
                if (!symbols.contains(d)) bad()
                Some(d)
              case None => None
              case _ => bad()
            }
            val e = EnumS(name, aliasesOf(o), symbols, dflt)
            named(name) = e; e
          case "fixed" =>
            val name = o.get("name") match {
              case Some(JString(n)) => n; case _ => bad()
            }
            val size = o.get("size") match {
              case Some(JLong(s)) if s >= 0 && s <= (1 << 20) => s.toInt
              case _ => bad()
            }
            val f = FixedS(name, aliasesOf(o), size)
            named(name) = f; f
          case "array" =>
            ArrayS(schemaOf(o.get("items").getOrElse(bad()), named,
              depth + 1))
          case "map" =>
            MapS(schemaOf(o.get("values").getOrElse(bad()), named,
              depth + 1))
          case prim => primOrRef(prim, named)
        }
      case _ => bad()
    }
  }

  private def primOrRef(
      s: String,
      named: scala.collection.mutable.Map[String, S]): S =
    s match {
      case "null" => NullS
      case "boolean" => BoolS
      case "int" => IntS
      case "long" => LongS
      case "float" => FloatS
      case "double" => DoubleS
      case "bytes" => BytesS
      case "string" => StringS
      case ref => named.getOrElse(ref, bad())
    }

  // ---- name matching -------------------------------------------------------

  /** Does the reader's named type accept the writer's name? The
    * reader's unqualified name, or any of its aliases, must equal the
    * writer's (this schema dialect carries no namespaces).
    */
  private def nameOk(writerName: String, readerName: String,
                     readerAliases: Set[String]): Boolean =
    readerName == writerName || readerAliases.contains(writerName)

  /** Can (writer, reader) match at the top level? `exact` pass: same
    * category, named types by name; promotion pass additionally
    * allows the spec's promotions. Used for reader-union branch
    * selection (first exact match wins over a promotion match).
    */
  private def branchMatch(w0: S, r0: S, exact: Boolean): Boolean = {
    val w = deref(w0); val r = deref(r0)
    (w, r) match {
      case (NullS, NullS) | (BoolS, BoolS) | (IntS, IntS) |
           (LongS, LongS) | (FloatS, FloatS) | (DoubleS, DoubleS) |
           (BytesS, BytesS) | (StringS, StringS) => true
      case (a: RecordS, b: RecordS) => nameOk(a.name, b.name, b.aliases)
      case (a: EnumS, b: EnumS) => nameOk(a.name, b.name, b.aliases)
      case (a: FixedS, b: FixedS) =>
        nameOk(a.name, b.name, b.aliases) && a.size == b.size
      case (_: ArrayS, _: ArrayS) => true
      case (_: MapS, _: MapS) => true
      case (IntS, LongS | FloatS | DoubleS) => !exact
      case (LongS, FloatS | DoubleS) => !exact
      case (FloatS, DoubleS) => !exact
      case (StringS, BytesS) => !exact
      case (BytesS, StringS) => !exact
      case _ => false
    }
  }

  // ---- default materialization ---------------------------------------------

  /** Turn a reader field's JSON `default` into a value of the reader
    * schema (spec: bytes/fixed defaults are JSON strings whose code
    * points 0-255 map to bytes; a union default matches the FIRST
    * branch).
    */
  private def defaultV(r0: S, j: JValue, depth: Int): V = {
    if (depth > 48) bad()
    (deref(r0), j) match {
      case (NullS, JNull) => VNull
      case (BoolS, JBool(x)) => VBool(x)
      case (IntS | LongS, JLong(x)) => VLong(x)
      case (FloatS | DoubleS, JLong(x)) => VDouble(x.toDouble)
      case (FloatS | DoubleS, JDouble(x)) => VDouble(x)
      case (StringS, JString(x)) => VString(x)
      case (BytesS, JString(x)) =>
        val b = x.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        VBytes(b.length, b)
      case (f: FixedS, JString(x)) =>
        val b = x.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        if (b.length != f.size) bad()
        VBytes(b.length, b)
      case (e: EnumS, JString(x)) =>
        val i = e.symbols.indexOf(x)
        if (i < 0) bad()
        VEnum(i)
      case (ArrayS(items), JArray(xs)) =>
        VArray(xs.map(defaultV(items, _, depth + 1)))
      case (MapS(values), o: JObject) =>
        VMap(o.fields.map { case (k, v) =>
          k -> defaultV(values, v, depth + 1)
        })
      case (rec: RecordS, o: JObject) =>
        VRecord(rec.fields.map { f =>
          val fj = o.get(f.name).orElse(f.default).getOrElse(bad())
          f.name -> defaultV(f.schema, fj, depth + 1)
        })
      case (UnionS(branches), _) =>
        if (branches.isEmpty) bad()
        defaultV(branches.head, j, depth + 1)
      case _ => bad()
    }
  }

  // ---- skip walk (writer-only fields) ---------------------------------------

  private val MaxItems = 1 << 22

  /** Stride over one datum of the WRITER schema without building a
    * value — how writer-only record fields leave the byte stream.
    * Array/map blocks written in the negative-count form skip by
    * their declared byte size without touching the items.
    */
  private def skip(b: Array[Byte], pos: Int, s0: S, depth: Int): Int = {
    if (depth > 48) bad()
    deref(s0) match {
      case NullS => pos
      case BoolS =>
        if (pos >= b.length || (b(pos) & 0xff) > 1) bad()
        pos + 1
      case IntS | LongS =>
        val v = Avro.varint(b, pos); if (v == null) bad(); v._2
      case FloatS =>
        if (pos + 4 > b.length) bad(); pos + 4
      case DoubleS =>
        if (pos + 8 > b.length) bad(); pos + 8
      case BytesS | StringS =>
        val v = Avro.varint(b, pos)
        if (v == null || v._1 < 0 || v._2 + v._1 > b.length) bad()
        v._2 + v._1.toInt
      case e: EnumS =>
        val v = Avro.varint(b, pos)
        if (v == null || v._1 < 0 || v._1 >= e.symbols.length) bad()
        v._2
      case f: FixedS =>
        if (pos + f.size > b.length) bad()
        pos + f.size
      case UnionS(branches) =>
        val v = Avro.varint(b, pos)
        if (v == null || v._1 < 0 || v._1 >= branches.length) bad()
        skip(b, v._2, branches(v._1.toInt), depth + 1)
      case RecordS(_, _, fields) =>
        var p = pos
        fields.foreach(f => p = skip(b, p, f.schema, depth + 1))
        p
      case ArrayS(items) => skipBlocks(b, pos, items, keyed = false, depth)
      case MapS(values) => skipBlocks(b, pos, values, keyed = true, depth)
      case _: RefS => bad() // deref above makes this unreachable
    }
  }

  private def skipBlocks(b: Array[Byte], pos: Int, item: S,
                         keyed: Boolean, depth: Int): Int = {
    var p = pos
    var total = 0L
    var stop = false
    while (!stop) {
      val c = Avro.varint(b, p)
      if (c == null) bad()
      p = c._2
      var n = c._1
      if (n == 0) stop = true
      else if (n < 0) {
        // negative count: a byte size follows — skip wholesale
        val sz = Avro.varint(b, p)
        if (sz == null || sz._1 < 0 || sz._2 + sz._1 > b.length) bad()
        total -= n
        if (total > MaxItems) bad()
        p = (sz._2 + sz._1).toInt
      } else {
        total += n
        if (total > MaxItems) bad()
        var i = 0L
        while (i < n) {
          if (keyed) {
            val k = Avro.varint(b, p)
            if (k == null || k._1 < 0 || k._2 + k._1 > b.length) bad()
            p = k._2 + k._1.toInt
          }
          p = skip(b, p, item, depth + 1)
          i += 1
        }
      }
    }
    p
  }

  // ---- resolving decode ------------------------------------------------------

  private val MaxCapturedBytes = 1 << 16

  private def lenPrefixed(b: Array[Byte], pos: Int): (Array[Byte], Int) = {
    val v = Avro.varint(b, pos)
    if (v == null || v._1 < 0 || v._2 + v._1 > b.length) bad()
    (java.util.Arrays.copyOfRange(b, v._2, v._2 + v._1.toInt),
      v._2 + v._1.toInt)
  }

  private def datum(b: Array[Byte], pos: Int, w0: S, r0: S,
                    depth: Int): (V, Int) = {
    if (depth > 48) bad()
    val w = deref(w0)
    val r = deref(r0)
    (w, r) match {
      // writer union first: the branch index is IN THE BYTES and must
      // be consumed regardless of the reader's shape
      case (UnionS(wbs), _) =>
        val v = Avro.varint(b, pos)
        if (v == null || v._1 < 0 || v._1 >= wbs.length) bad()
        datum(b, v._2, wbs(v._1.toInt), r, depth + 1)
      // reader union: first matching branch, exact pass then promotions
      case (_, UnionS(rbs)) =>
        val bi = {
          val ex = rbs.indexWhere(branchMatch(w, _, exact = true))
          if (ex >= 0) ex
          else rbs.indexWhere(branchMatch(w, _, exact = false))
        }
        if (bi < 0) bad()
        datum(b, pos, w, rbs(bi), depth + 1)
      case (NullS, NullS) => (VNull, pos)
      case (BoolS, BoolS) =>
        if (pos >= b.length) bad()
        val x = b(pos) & 0xff
        if (x > 1) bad()
        (VBool(x == 1), pos + 1)
      case (IntS | LongS, IntS | LongS) =>
        // int may NOT narrow into int-only readers from a long writer
        if (w == LongS && r == IntS) bad()
        val v = Avro.varint(b, pos); if (v == null) bad()
        (VLong(v._1), v._2)
      case (IntS | LongS, FloatS | DoubleS) =>
        val v = Avro.varint(b, pos); if (v == null) bad()
        (VDouble(v._1.toDouble), v._2)
      case (FloatS, FloatS | DoubleS) =>
        if (pos + 4 > b.length) bad()
        val bits = (b(pos) & 0xff) | (b(pos + 1) & 0xff) << 8 |
          (b(pos + 2) & 0xff) << 16 | (b(pos + 3) & 0xff) << 24
        (VDouble(java.lang.Float.intBitsToFloat(bits).toDouble), pos + 4)
      case (DoubleS, DoubleS) =>
        if (pos + 8 > b.length) bad()
        var bits = 0L
        var i = 7
        while (i >= 0) { bits = (bits << 8) | (b(pos + i) & 0xffL); i -= 1 }
        (VDouble(java.lang.Double.longBitsToDouble(bits)), pos + 8)
      case (BytesS | StringS, BytesS) =>
        val (raw, np) = lenPrefixed(b, pos)
        (VBytes(raw.length, if (raw.length <= MaxCapturedBytes) raw
        else null), np)
      case (BytesS | StringS, StringS) =>
        val (raw, np) = lenPrefixed(b, pos)
        (VString(new String(raw,
          java.nio.charset.StandardCharsets.UTF_8)), np)
      case (we: EnumS, re: EnumS) =>
        if (!nameOk(we.name, re.name, re.aliases)) bad()
        val v = Avro.varint(b, pos)
        if (v == null || v._1 < 0 || v._1 >= we.symbols.length) bad()
        val sym = we.symbols(v._1.toInt)
        val ri = re.symbols.indexOf(sym)
        if (ri >= 0) (VEnum(ri), v._2)
        else re.default match {
          case Some(d) => (VEnum(re.symbols.indexOf(d)), v._2)
          case None => bad()
        }
      case (wf: FixedS, rf: FixedS) =>
        if (!nameOk(wf.name, rf.name, rf.aliases) ||
          wf.size != rf.size) bad()
        if (pos + wf.size > b.length) bad()
        val content =
          if (wf.size <= MaxCapturedBytes)
            java.util.Arrays.copyOfRange(b, pos, pos + wf.size)
          else null
        (VBytes(wf.size, content), pos + wf.size)
      case (wr: RecordS, rr: RecordS) =>
        if (!nameOk(wr.name, rr.name, rr.aliases)) bad()
        // writer order drives the byte walk; reader order drives the
        // output. A reader field matches a writer field by name or by
        // any of the READER field's aliases.
        var p = pos
        val byWriterField =
          scala.collection.mutable.Map.empty[String, V]
        wr.fields.foreach { wf =>
          val rfOpt = rr.fields.find(rf =>
            rf.name == wf.name || rf.aliases.contains(wf.name))
          rfOpt match {
            case Some(rf) =>
              val (v, np) = datum(b, p, wf.schema, rf.schema, depth + 1)
              byWriterField(rf.name) = v
              p = np
            case None =>
              p = skip(b, p, wf.schema, depth + 1)
          }
        }
        val out = rr.fields.map { rf =>
          byWriterField.get(rf.name) match {
            case Some(v) => rf.name -> v
            case None =>
              rf.name -> defaultV(rf.schema,
                rf.default.getOrElse(bad()), depth + 1)
          }
        }
        (VRecord(out), p)
      case (ArrayS(wi), ArrayS(ri)) =>
        var p = pos
        val out = Vector.newBuilder[V]
        var total = 0L
        var stop = false
        while (!stop) {
          val c = Avro.varint(b, p)
          if (c == null) bad()
          p = c._2
          var n = c._1
          if (n == 0) stop = true
          else {
            if (n < 0) {
              val sz = Avro.varint(b, p)
              if (sz == null || sz._1 < 0) bad()
              p = sz._2
              n = -n
            }
            total += n
            if (total > MaxItems) bad()
            var i = 0L
            while (i < n) {
              val (v, np) = datum(b, p, wi, ri, depth + 1)
              out += v
              p = np
              i += 1
            }
          }
        }
        (VArray(out.result()), p)
      case (MapS(wv), MapS(rv)) =>
        var p = pos
        val out = Vector.newBuilder[(String, V)]
        var total = 0L
        var stop = false
        while (!stop) {
          val c = Avro.varint(b, p)
          if (c == null) bad()
          p = c._2
          var n = c._1
          if (n == 0) stop = true
          else {
            if (n < 0) {
              val sz = Avro.varint(b, p)
              if (sz == null || sz._1 < 0) bad()
              p = sz._2
              n = -n
            }
            total += n
            if (total > MaxItems) bad()
            var i = 0L
            while (i < n) {
              val k = Avro.varint(b, p)
              if (k == null || k._1 < 0 || k._2 + k._1 > b.length) bad()
              val key = new String(b, k._2, k._1.toInt,
                java.nio.charset.StandardCharsets.UTF_8)
              val (v, np) = datum(b, k._2 + k._1.toInt, wv, rv, depth + 1)
              out += key -> v
              p = np
              i += 1
            }
          }
        }
        (VMap(out.result()), p)
      case _ => bad() // incompatible pair: fail CLOSED
    }
  }

  /** Resolve-decode one bare datum written under `writer`, read under
    * `reader`. None on any malformation or incompatibility.
    */
  def parseDatum(b: Array[Byte], pos: Int, writer: S,
                 reader: S): Option[(V, Int)] =
    try Some(datum(b, pos, writer, reader, 0))
    catch { case _: Bad => None }

  /** Read a whole object container under an EVOLVED reader schema:
    * the embedded writer schema drives the byte walk, `readerJson`
    * the values. Decoded.schemaJson is the WRITER's (provenance).
    * None on any malformation or an incompatible (writer, reader)
    * pair the data exercises.
    */
  def parseContainer(b: Array[Byte],
                     readerJson: String): Option[AvroGeneric.Decoded] =
    for {
      rb <- AvroGeneric.rawBlocks(b)
      writer <- parseSchema(rb.schemaJson)
      reader <- parseSchema(readerJson)
      records <- try {
        val out = Vector.newBuilder[V]
        var ok = true
        rb.blocks.foreach { case (cnt, raw) =>
          var rp = 0
          var i = 0L
          while (ok && i < cnt) {
            val (v, np) = datum(raw, rp, writer, reader, 0)
            out += v
            rp = np
            i += 1
          }
          if (rp != raw.length) ok = false // leftover bytes = desync
        }
        if (ok) Some(out.result()) else None
      } catch { case _: Bad => None }
    } yield AvroGeneric.Decoded(rb.schemaJson, records)
}
