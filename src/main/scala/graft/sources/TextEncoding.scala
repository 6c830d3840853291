package graft.sources

/** Text-encoding sniff + STRICT decode — the step before any text
  * operator when the corpus is scraped files rather than a lake:
  * real archives mix UTF-8 (with and without BOM) and both UTF-16
  * byte orders, and a reader that assumes UTF-8 turns every UTF-16
  * file into NUL-ridden mojibake that still "decodes" (and then
  * poisons dedup hashes and language ID downstream).
  *
  * Dispatch is by BOM (the Unicode standard's table): EF BB BF →
  * UTF-8 (BOM stripped), FF FE → UTF-16LE, FE FF → UTF-16BE,
  * otherwise UTF-8. Decode is STRICT (CodingErrorAction.REPORT):
  * malformed sequences are None — the totality law — never U+FFFD
  * substitution that silently corrupts content hashes.
  */
object TextEncoding {

  sealed trait Detected { def name: String }
  case object Utf8 extends Detected { val name = "utf-8" }
  case object Utf8Bom extends Detected { val name = "utf-8-bom" }
  case object Utf16LE extends Detected { val name = "utf-16le" }
  case object Utf16BE extends Detected { val name = "utf-16be" }

  /** Sniff the BOM. Never fails — no BOM just means UTF-8. */
  def sniff(b: Array[Byte]): Detected = {
    if (b.length >= 3 && b(0) == 0xef.toByte && b(1) == 0xbb.toByte &&
      b(2) == 0xbf.toByte) Utf8Bom
    else if (b.length >= 2 && b(0) == 0xff.toByte && b(1) == 0xfe.toByte)
      Utf16LE
    else if (b.length >= 2 && b(0) == 0xfe.toByte && b(1) == 0xff.toByte)
      Utf16BE
    else Utf8
  }

  /** Sniff + strict decode. None on any malformed sequence, an
    * unpaired surrogate, or an odd-length UTF-16 body.
    */
  def decode(b: Array[Byte]): Option[(Detected, String)] = {
    val det = sniff(b)
    val (off, cs) = det match {
      case Utf8 => (0, java.nio.charset.StandardCharsets.UTF_8)
      case Utf8Bom => (3, java.nio.charset.StandardCharsets.UTF_8)
      case Utf16LE => (2, java.nio.charset.StandardCharsets.UTF_16LE)
      case Utf16BE => (2, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(
          java.nio.charset.CodingErrorAction.REPORT)
      val out = dec.decode(
        java.nio.ByteBuffer.wrap(b, off, b.length - off))
      Some((det, out.toString))
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
    }
  }
}
