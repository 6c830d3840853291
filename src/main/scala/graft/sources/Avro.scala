package graft.sources

import org.apache.spark.sql.{Dataset, Encoders}

/** Avro OBJECT CONTAINER FILE walk (the Apache Avro 1.x spec's file
  * format) — the canonical data-lake container: Kafka dumps, Sqoop
  * exports, and event-log archives all ship as `.avro`. The layout:
  *
  * {{{
  *   "Obj" 0x01                                  4-byte magic
  *   file metadata: map<string, bytes>           avro.schema, avro.codec
  *   16-byte sync marker
  *   per block: record count (zigzag varint),
  *              byte size    (zigzag varint),
  *              payload      (deflated when codec=deflate),
  *              16-byte sync marker               MUST equal the header's
  * }}}
  *
  * Every integer is a ZIGZAG VARINT (n → (n<<1)^(n>>63), then 7-bit
  * little-endian groups with a continuation MSB) — the format has no
  * fixed-width numbers at all. The per-block sync marker is the crash
  * -recovery mechanism (a reader seeks to the next sync after damage);
  * HERE a sync mismatch ends the walk — report damage, don't resync
  * silently — and earlier blocks are kept (the gzip-member posture:
  * crawl-scale files are routinely cut mid-block).
  *
  * Scope: the `(long, string)` record schema the corpus queries use
  * (id + payload — the Kafka-dump shape), codecs `null`, `deflate`
  * (raw DEFLATE per the spec) and `snappy` (block payload + 4-byte
  * big-endian CRC32 of the uncompressed bytes, decoded by the
  * engine's OWN [[Snappy]]). One blob per
  * scan task, records exploded with zero shuffles ([[Warc.records]] /
  * [[Zip.entries]] posture). Malformed header, unknown codec, a block
  * whose payload does not parse into exactly `count` records, or a
  * varint running past the buffer → the walk stops with what it has
  * (blocks are independent); a malformed HEADER yields Nil.
  */
object Avro {

  /** One input blob: an .avro container's raw bytes. */
  case class AvroBlob(blob_id: Long, content: Array[Byte])

  /** One decoded record with its container coordinates. */
  case class AvroRecord(blob_id: Long, block_idx: Int, rec_idx: Int,
                        rec_id: Long, payload: String,
                        codec: String, sync_ok: Boolean)

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Zigzag-varint encode into `out`. */
  private[graft] def putVarint(out: java.io.ByteArrayOutputStream, n: Long): Unit = {
    var z = (n << 1) ^ (n >> 63)
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt)
      z >>>= 7
    }
    out.write(z.toInt)
  }

  /** Zigzag-varint decode at `pos`; returns (value, nextPos) or null on
    * truncation/overlong (> 10 bytes).
    */
  private[graft] def varint(b: Array[Byte], pos: Int): (Long, Int) = {
    var z = 0L
    var shift = 0
    var p = pos
    while (p < b.length && shift <= 63) {
      val byte = b(p) & 0xff
      z |= (byte & 0x7fL) << shift
      p += 1
      if ((byte & 0x80) == 0) return ((z >>> 1) ^ -(z & 1L), p)
      shift += 7
    }
    null
  }

  private def putString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    putVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** The corpus record schema, as the writer declares it. */
  val SchemaJson: String =
    """{"type":"record","name":"doc","fields":[""" +
      """{"name":"rec_id","type":"long"},""" +
      """{"name":"payload","type":"string"}]}"""

  /** Write an object container file: `(rec_id, payload)` records in
    * blocks of `blockRecords`, codec `null` or `deflate` (level 6 —
    * the q190-pinned canonical-zlib level), with the given 16-byte
    * sync marker.
    */
  def write(records: Seq[(Long, String)], sync: Array[Byte],
            codec: String = "null", blockRecords: Int = 5): Array[Byte] = {
    require(sync.length == 16, "sync marker is 16 bytes")
    require(codec == "null" || codec == "deflate" ||
      codec == "snappy" || codec == "zstandard", s"codec $codec")
    require(blockRecords > 0, "blockRecords must be positive")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    // file metadata map: one count-prefixed group, then the 0 terminator
    putVarint(out, 2L)
    putString(out, "avro.schema")
    putString(out, SchemaJson)
    putString(out, "avro.codec")
    putString(out, codec)
    putVarint(out, 0L)
    out.write(sync, 0, 16)
    records.grouped(blockRecords).foreach { group =>
      val body = new java.io.ByteArrayOutputStream()
      group.foreach { case (id, payload) =>
        putVarint(body, id)
        putString(body, payload)
      }
      val raw = body.toByteArray
      val data =
        if (codec == "null") raw
        else if (codec == "zstandard")
          // spec "avro.codec: zstandard": each block is one zstd
          // frame; raw-block form (RFC 8878 legal, like the stored
          // snappy) keeps the layout deterministic for the size oracle
          Zstd.frameStored(raw)
        else if (codec == "snappy") {
          // spec: snappy payload, then BE CRC32 of the UNCOMPRESSED
          // bytes; stored-literal form keeps the layout deterministic
          val comp = Snappy.compressStored(raw)
          val crc = new java.util.zip.CRC32()
          crc.update(raw)
          val v = crc.getValue
          comp ++ Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
            (v >> 8).toByte, v.toByte)
        } else {
          val d = new java.util.zip.Deflater(6, true)
          try {
            d.setInput(raw); d.finish()
            val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
            val chunk = new Array[Byte](8192)
            while (!d.finished()) bos.write(chunk, 0, d.deflate(chunk))
            bos.toByteArray
          } finally d.end()
        }
      putVarint(out, group.length.toLong)
      putVarint(out, data.length.toLong)
      out.write(data, 0, data.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  /** Walk one container. Malformed header → Nil; damage mid-stream
    * (bad sync, truncated block, payload not parsing into exactly
    * `count` records) ends the walk keeping earlier blocks, with the
    * failing block's records carrying `sync_ok=false` when it is the
    * sync that broke (damage counted, not vanished).
    */
  def parse(blobId: Long, b: Array[Byte]): Seq[AvroRecord] = {
    if (b.length < 20 || !Magic.indices.forall(i => b(i) == Magic(i)))
      return Nil
    // ---- metadata map --------------------------------------------------
    var pos = 4
    var codec = "null"
    var schema: String = null
    var mapDone = false
    while (!mapDone) {
      val c = varint(b, pos)
      if (c == null) return Nil
      pos = c._2
      val n = c._1
      if (n == 0) mapDone = true
      else {
        // negative counts carry a byte size (spec) — not emitted by any
        // writer this walk targets; treat as malformation
        if (n < 0) return Nil
        var i = 0L
        while (i < n) {
          val k = varint(b, pos)
          if (k == null || k._1 < 0 || k._2 + k._1 > b.length) return Nil
          val key = new String(b, k._2, k._1.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          pos = k._2 + k._1.toInt
          val v = varint(b, pos)
          if (v == null || v._1 < 0 || v._2 + v._1 > b.length) return Nil
          val value = new String(b, v._2, v._1.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          pos = v._2 + v._1.toInt
          if (key == "avro.codec") codec = value
          if (key == "avro.schema") schema = value
          i += 1
        }
      }
    }
    // The record layout below is a CONTRACT, not an assumption: the
    // declared schema must be the (long, string) shape this walk
    // decodes, field order and types included — whitespace-insensitive,
    // since writers serialize the JSON differently. Anything else
    // routes to a full Avro stack rather than misreading varints as
    // the wrong fields.
    if (schema == null ||
      schema.replaceAll("\\s", "") != SchemaJson.replaceAll("\\s", ""))
      return Nil
    if (codec != "null" && codec != "deflate" && codec != "snappy" &&
      codec != "zstandard")
      return Nil // route elsewhere
    if (pos + 16 > b.length) return Nil
    val sync = java.util.Arrays.copyOfRange(b, pos, pos + 16)
    pos += 16
    // ---- block walk ----------------------------------------------------
    val out = scala.collection.mutable.ArrayBuffer.empty[AvroRecord]
    var blockIdx = 0
    var stop = false
    while (!stop && pos < b.length) {
      val cnt = varint(b, pos)
      if (cnt == null || cnt._1 <= 0) { stop = true }
      else {
        val sz = varint(b, cnt._2)
        if (sz == null || sz._1 < 0 ||
          sz._2 + sz._1 + 16 > b.length) { stop = true }
        else {
          val dataOff = sz._2
          val dataLen = sz._1.toInt
          val raw: Array[Byte] =
            if (codec == "null")
              java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen)
            else if (codec == "snappy")
              snappyBlock(b, dataOff, dataLen)
            else if (codec == "zstandard")
              // one zstd frame per block, engine-owned full decode
              Zstd.walk(java.util.Arrays.copyOfRange(
                  b, dataOff, dataOff + dataLen)) match {
                case Some(Seq(fr)) if fr.kind == "zstd" => fr.decoded
                case _ => null
              }
            else {
              val inf = new java.util.zip.Inflater(true)
              try {
                inf.setInput(b, dataOff, dataLen)
                val bos = new java.io.ByteArrayOutputStream(dataLen * 2 + 64)
                val chunk = new Array[Byte](8192)
                var err = false
                while (!err && !inf.finished()) {
                  val n =
                    try inf.inflate(chunk)
                    catch {
                      case _: java.util.zip.DataFormatException =>
                        err = true; 0
                    }
                  if (n > 0) bos.write(chunk, 0, n)
                  else if (!err && !inf.finished()) err = true
                  // adversarial-allocation bound (same 2^26 cap as the
                  // PNG/GIF/JPEG decoders): a crafted ~1000:1 block must
                  // hit the damage path, not grow the task heap unbounded
                  if (bos.size() > (1 << 26)) err = true
                }
                if (err) null else bos.toByteArray
              } finally inf.end()
            }
          if (raw == null) stop = true
          else {
            // records: exactly `cnt` (id, payload) pairs, nothing left
            val recs = scala.collection.mutable.ArrayBuffer
              .empty[(Long, String)]
            var rp = 0
            var bad = false
            var i = 0L
            while (!bad && i < cnt._1) {
              val idv = varint(raw, rp)
              if (idv == null) bad = true
              else {
                val lv = varint(raw, idv._2)
                if (lv == null || lv._1 < 0 ||
                  lv._2 + lv._1 > raw.length) bad = true
                else {
                  recs += ((idv._1, new String(raw, lv._2, lv._1.toInt,
                    java.nio.charset.StandardCharsets.UTF_8)))
                  rp = lv._2 + lv._1.toInt
                }
              }
              i += 1
            }
            if (bad || rp != raw.length) stop = true
            else {
              val syncAt = dataOff + dataLen
              val syncOk = (0 until 16).forall(i => b(syncAt + i) == sync(i))
              recs.zipWithIndex.foreach { case ((id, pl), ri) =>
                out += AvroRecord(blobId, blockIdx, ri, id, pl, codec, syncOk)
              }
              if (!syncOk) stop = true // damage observable, walk ends
              pos = syncAt + 16
              blockIdx += 1
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** Explode containers into records on the scan tasks — zero shuffles,
    * one file per row.
    */
  def records(blobs: Dataset[AvroBlob]): Dataset[AvroRecord] = {
    implicit val enc = Encoders.product[AvroRecord]
    blobs.mapPartitions(_.flatMap(a => parse(a.blob_id, a.content)))
  }

  /** Decode one snappy-codec block: the last 4 payload bytes are the
    * BIG-ENDIAN CRC32 of the uncompressed data (Avro spec, "Required
    * Codecs"); a size bomb, malformed stream, or CRC mismatch is
    * damage (null). Decoded through the engine's OWN [[Snappy]] —
    * nothing links against snappy-java here.
    */
  private[graft] def snappyBlock(b: Array[Byte], off: Int,
                                 len: Int): Array[Byte] = {
    if (len < 4) return null
    Snappy.uncompressSelf(b, off, len - 4, 1 << 26) match {
      case Some(d) =>
        val crc = new java.util.zip.CRC32()
        crc.update(d)
        val p = off + len - 4
        val want = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
        if ((crc.getValue & 0xffffffffL) == want) d else null
      case None => null
    }
  }
}
