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
}
