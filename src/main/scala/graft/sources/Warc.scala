package graft.sources

import org.apache.spark.sql.{Dataset, Encoders}

/** WARC (ISO 28500) record framing — the wire format Common Crawl ships,
  * i.e. the first parse every web-scale pretraining corpus runs.
  *
  * A WARC file is a concatenation of records, each:
  * {{{
  *   WARC/1.0\r\n
  *   <header-name>: <value>\r\n   (repeated; incl. Content-Length: N)
  *   \r\n
  *   <N payload bytes>\r\n\r\n
  * }}}
  * The only way to find record K+1 is to parse record K's Content-Length
  * and stride — exactly the JPEG-segment/MP4-box shape, at corpus scale.
  *
  * Scale posture: at 100 TB the unit of work is one WARC file (or one
  * gzip member) per task — `spark.read.format("binaryFile")` or a
  * custom stream loader yields (path, bytes) rows, and [[records]]
  * explodes each blob on the scan task with ZERO shuffles; record
  * parsing never needs cross-blob context. Malformed stretches resync
  * by scanning to the next `WARC/1.0` magic rather than discarding the
  * rest of the blob (crawl data is dirty; one truncated record must
  * not cost a file).
  */
object Warc {

  /** One input blob: a WARC file's (or gzip member's) raw bytes. */
  case class WarcBlob(blob_id: Long, content: Array[Byte])

  /** One parsed record. `payload` is returned as a String for the
    * text/response records a pretraining pipeline keeps; binary payloads
    * would carry the (offset, length) and re-slice lazily instead.
    */
  case class WarcRecord(blob_id: Long, offset: Long, record_type: String,
                        target_uri: String, content_length: Long,
                        payload: String)

  private val Magic = "WARC/1.0".getBytes("US-ASCII")

  /** Parse every record in one blob. Tolerant walk: records missing the
    * magic or a parseable Content-Length are skipped by resyncing to the
    * next magic occurrence; a Content-Length overrunning the blob ends
    * the walk (truncated tail).
    */
  def parse(blobId: Long, b: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def magicAt(i: Int): Boolean =
      i + Magic.length <= b.length && {
        var k = 0
        while (k < Magic.length && b(i + k) == Magic(k)) k += 1
        k == Magic.length
      }
    def nextMagic(from: Int): Int = {
      var i = from
      while (i < b.length && !magicAt(i)) i += 1
      i
    }
    def findHeaderEnd(from: Int): Int = { // index of \r\n\r\n start, or -1
      var i = from
      while (i + 3 < b.length &&
        !(b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')) i += 1
      if (i + 3 < b.length) i else -1
    }
    while (pos < b.length) {
      if (!magicAt(pos)) pos = nextMagic(pos)
      if (pos < b.length) {
        val hdrEnd = findHeaderEnd(pos)
        if (hdrEnd < 0) pos = b.length // no complete header: done
        else {
          val header = new String(b, pos, hdrEnd - pos,
            java.nio.charset.StandardCharsets.US_ASCII)
          // ISO 28500 §4 field names are case-insensitive — tools emit
          // e.g. `content-length:` — so keys are lowercased; values keep
          // their case (URIs, types).
          val fields = header.split("\r\n").drop(1).flatMap { line =>
            val i = line.indexOf(':')
            if (i < 0) None
            else Some(line.take(i).trim.toLowerCase(java.util.Locale.ROOT) ->
              line.drop(i + 1).trim)
          }.toMap
          fields.get("content-length").flatMap(_.toLongOption) match {
            case Some(cl) if cl < 0 => pos = nextMagic(pos + 1) // hostile length: resync
            case Some(cl) if hdrEnd + 4 + cl <= b.length =>
              val payloadStart = hdrEnd + 4
              out += WarcRecord(blobId, pos.toLong,
                fields.getOrElse("warc-type", ""),
                fields.getOrElse("warc-target-uri", ""),
                cl,
                new String(b, payloadStart, cl.toInt,
                  java.nio.charset.StandardCharsets.UTF_8))
              pos = payloadStart + cl.toInt + 4 // skip the \r\n\r\n trailer
            case Some(_) => pos = b.length // truncated payload: stop
            case None => pos = nextMagic(pos + 1) // unframed: resync
          }
        }
      }
    }
    out.toSeq
  }

  /** Explode a Dataset of WARC blobs into records on the scan tasks —
    * zero shuffles; parallelism = number of blobs (at crawl scale, one
    * blob per file ≈ tens of thousands of tasks).
    */
  def records(blobs: Dataset[WarcBlob]): Dataset[WarcRecord] = {
    implicit val enc = Encoders.product[WarcRecord]
    blobs.mapPartitions(_.flatMap(w => parse(w.blob_id, w.content)))
  }

  /** Decompress a (possibly multi-member) gzip blob — Common Crawl ships
    * `.warc.gz` files as ONE GZIP MEMBER PER RECORD so consumers can
    * split on member boundaries; JDK GZIPInputStream natively reads
    * concatenated members, and the record walk then runs on the joined
    * plaintext. Returns None for non-gzip bytes (magic 1F 8B) so callers
    * can route uncompressed WARCs through [[parse]] directly.
    */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] = {
    val isGz = b.length >= 2 && (b(0) & 0xff) == 0x1F && (b(1) & 0xff) == 0x8B
    if (!isGz) None
    else {
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } catch {
        // corrupt or truncated member: keep what decompressed cleanly —
        // a cut-off crawl file must still yield its earlier records
        case _: java.io.IOException => ()
      }
      Some(out.toByteArray)
    }
  }

  /** Parse a WARC blob that may be gzip-compressed (.warc.gz, including
    * the member-per-record layout Common Crawl publishes) or plain.
    */
  def parseAuto(blobId: Long, b: Array[Byte]): Seq[WarcRecord] =
    parse(blobId, gunzip(b).getOrElse(b))

  /** Streaming twin over a `binaryFile` file-stream source (the shape a
    * live crawl delivery takes: WARC files landing in a directory, each
    * micro-batch = the newly arrived files). `files` must carry the
    * binaryFile schema (`path`, `content`); blob_id is the path hash so
    * records stay attributable to their file across restarts. Downstream
    * gates (dedup, quality, near-dup) compose exactly as in batch — the
    * record walk itself is stateless per file, so the stream needs no
    * watermark and replays idempotently from the checkpoint.
    */
  def recordStream(files: org.apache.spark.sql.DataFrame): Dataset[WarcRecord] = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    implicit val tup = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val enc = Encoders.product[WarcRecord]
    files.select(xxhash64(col("path")).as("blob_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseAuto(id, bytes) })
  }
}
