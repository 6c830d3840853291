package graft.sources

/** WARC (ISO 28500) record WRITER — the write twin of [[Warc.parse]]
  * and the format a crawl pipeline's archiver emits: per record
  * `WARC/1.0\r\n`, the named header fields (WARC-Type,
  * WARC-Target-URI, WARC-Record-ID, WARC-Date, Content-Length),
  * `\r\n`, the payload, `\r\n\r\n`. [[writeGz]] emits the
  * member-per-record `.warc.gz` layout Common Crawl publishes —
  * ONE gzip member per record, through the engine's OWN gzip +
  * DEFLATE encoder ([[Gzip.writeMemberOwn]]) — so consumers can
  * split on member boundaries without parsing WARC at all.
  *
  * Deterministic: record ids and dates must be supplied by the
  * caller (derived from stable keys), so byte oracles can pin the
  * output.
  */
object WarcWrite {

  // WARC 1.0 permits UTF-8 header values (ISO 28500 §4); US_ASCII
  // getBytes would silently replace non-ASCII with '?', corrupting a
  // non-ASCII WARC-Target-URI in place while the framing stays valid.
  private val Ascii = java.nio.charset.StandardCharsets.UTF_8

  /** One record's bytes. `payload` is written verbatim;
    * Content-Length is computed from it (the framing law the reader
    * strides on).
    */
  def record(recordType: String, targetUri: String, recordId: String,
             date: String, payload: Array[Byte]): Array[Byte] = {
    val hdr = new StringBuilder()
    hdr.append("WARC/1.0\r\n")
    hdr.append("WARC-Type: ").append(recordType).append("\r\n")
    if (targetUri.nonEmpty)
      hdr.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    hdr.append("WARC-Record-ID: <urn:uuid:").append(recordId)
      .append(">\r\n")
    hdr.append("WARC-Date: ").append(date).append("\r\n")
    hdr.append("Content-Length: ").append(payload.length)
      .append("\r\n\r\n")
    val hb = hdr.toString.getBytes(Ascii)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** A plain `.warc`: records concatenated. */
  def write(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach(r => out.write(r, 0, r.length))
    out.toByteArray
  }

  /** The `.warc.gz` member-per-record layout: each record its own
    * gzip member (own DEFLATE encoder), concatenated.
    */
  def writeGz(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val m = Gzip.writeMemberOwn(r)
      out.write(m, 0, m.length)
    }
    out.toByteArray
  }

  /** [[writeGz]] plus each member's (offset, length) — the numbers a
    * CDX index carries so a reader can gunzip ONE capture out of a
    * multi-gigabyte archive.
    */
  def writeGzIndexed(records: Seq[Array[Byte]])
      : (Array[Byte], Seq[(Long, Long)]) = {
    val out = new java.io.ByteArrayOutputStream()
    val offs = records.map { r =>
      val off = out.size.toLong
      val m = Gzip.writeMemberOwn(r)
      out.write(m, 0, m.length)
      (off, m.length.toLong)
    }
    (out.toByteArray, offs)
  }

  // ---- CDXJ index (q343) ---------------------------------------------------

  /** SURT (Sort-friendly URI Reordering Transform, the key the
    * web-archive world sorts on — pywb/OpenWayback form): scheme
    * dropped, host lowercased and label-reversed with commas, then
    * `)` + path?query lowercased. `https://News.Example.org/A/b?q=1`
    * -> `org,example,news)/a/b?q=1`.
    */
  def surt(uri: String): String = {
    val noScheme = uri.indexOf("://") match {
      case -1 => uri
      case i => uri.substring(i + 3)
    }
    val slash = noScheme.indexOf('/')
    val (host, path) =
      if (slash < 0) (noScheme, "/")
      else (noScheme.take(slash), noScheme.drop(slash))
    val h = host.toLowerCase(java.util.Locale.ROOT)
      .split('.').reverse.mkString(",")
    h + ")" + path.toLowerCase(java.util.Locale.ROOT)
  }

  /** RFC 4648 base32 (no padding needed — SHA-1 is 20 bytes, a
    * 32-char multiple), the WARC-Payload-Digest alphabet.
    */
  def sha1B32(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(payload)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var bits = 0L
    var nBits = 0
    d.foreach { b =>
      bits = (bits << 8) | (b & 0xffL); nBits += 8
      while (nBits >= 5) {
        sb.append(alpha(((bits >> (nBits - 5)) & 31).toInt))
        nBits -= 5
      }
    }
    sb.toString
  }

  final case class CdxEntry(uri: String, ts: String, offset: Long,
                            length: Long, digest: String,
                            filename: String)

  /** One CDXJ capture line: `<surt> <ts14> {json}` with
    * canonical-JSON (sorted keys) metadata — offset/length address
    * the gzip member inside `filename`.
    */
  def cdxjLine(e: CdxEntry): String =
    s"""${surt(e.uri)} ${e.ts} {"digest": "sha1:${e.digest}", "filename": "${e.filename}", "length": ${e.length}, "offset": ${e.offset}, "url": "${e.uri}"}"""

  /** The CDXJ index: capture lines sorted by (SURT, timestamp) — the
    * order the whole web-archive ecosystem binary-searches.
    */
  def cdxj(entries: Seq[CdxEntry]): Array[Byte] =
    entries.map(e => (surt(e.uri), e.ts, cdxjLine(e)))
      .sortBy(t => (t._1, t._2)).map(_._3)
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
