package graft.operators

/** BYTE-LEVEL text handling — the GPT-2 lineage's answer to the
  * open-vocabulary problem (Radford et al. 2019, the released
  * encoder's `bytes_to_unicode`): every BYTE maps to a printable
  * unicode code point through a fixed 256-entry bijection, so the
  * tokenizer's alphabet is exactly 256 symbols, NOTHING is ever
  * [UNK], and arbitrary bytes — emoji, CJK, even INVALID UTF-8 —
  * round-trip losslessly. The table is the published one: bytes
  * that are already printable-and-unmolested (33..126, 161..172,
  * 174..255) map to themselves; the remaining 68 bytes map to
  * 256+k in ascending byte order (so 0x20, the space, becomes
  * U+0120 'Ġ' — the familiar leading-space marker).
  *
  * Scale: the mapping is a pure per-row byte walk (mapPartitions
  * territory, like every multimodal codec here); no state, no
  * shuffle, no driver traffic.
  */
object ByteLevel extends Serializable {

  /** The 256-entry byte -> char bijection (GPT-2's table). */
  val byteToChar: Array[Char] = {
    val printable = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isP = printable.toSet
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (isP(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Bytes -> the byte-level unicode string (total: every byte has
    * an image; invalid UTF-8 is just bytes).
    */
  def encodeBytes(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      sb.append(byteToChar(b(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** The inverse walk. None on any char outside the table's image —
    * a string that did not come from [[encodeBytes]] must fail
    * CLOSED, never decode to garbage bytes.
    */
  def decodeToBytes(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      charToByte.get(s.charAt(i)) match {
        case Some(b) => out(i) = b
        case None => return None
      }
      i += 1
    }
    Some(out)
  }

  /** Byte-level PRETOKENIZATION over the mapped string: each token
    * is one optional leading space-image ('Ġ') followed by a maximal
    * run of non-space images; surplus space-images each stand alone.
    * The contract that matters is LOSSLESSNESS: the concatenation of
    * the pretokens is exactly the mapped input, so decode(concat) is
    * the original bytes whatever the segmentation did.
    */
  def pretokenize(mapped: String): Seq[String] = {
    val G = byteToChar(0x20)
    val out = Seq.newBuilder[String]
    var i = 0
    val n = mapped.length
    while (i < n) {
      val start = i
      if (mapped.charAt(i) == G) {
        i += 1
        if (i < n && mapped.charAt(i) != G) {
          while (i < n && mapped.charAt(i) != G) i += 1
        }
      } else {
        while (i < n && mapped.charAt(i) != G) i += 1
      }
      out += mapped.substring(start, i)
    }
    out.result()
  }
}
