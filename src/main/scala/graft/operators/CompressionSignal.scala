package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Compression-ratio text-quality signal: highly repetitive or
  * low-entropy documents (boilerplate floods, keyword stuffing, error
  * pages) deflate far better than natural prose, so the zlib ratio is a
  * cheap, language-agnostic junk detector used by web-corpus curation
  * pipelines alongside rule gates and LM scores.
  *
  * Runs per-partition with ONE reused Deflater per task (native zlib
  * state is expensive to allocate; resetting is cheap) — the classic
  * mapPartitions-amortized-setup shape. No oracle: SQL engines ship no
  * zlib, so correctness is spec-pinned against known-entropy inputs and
  * the driver's rows-only check. Deterministic: zlib level 6 output
  * bytes are a pure function of input bytes on every JVM this engine
  * targets, and only the SIZE is consumed anyway.
  *
  * Scale: pure scan-task work, zero shuffles; the ratio column then
  * feeds whatever gate composes it (cheap to compute at 100 TB because
  * deflate throughput ~100 MB/s/core dwarfs parquet scan decode).
  */
object CompressionSignal {

  case class DocCompression(doc_id: Long, raw_bytes: Int, deflate_bytes: Int,
                            ratio: Double)

  /** Deflate size of `bytes` at zlib level 6 using a caller-owned,
    * reset-between-uses Deflater.
    */
  def deflatedSize(d: java.util.zip.Deflater, bytes: Array[Byte]): Int = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** (doc_id, raw_bytes, deflate_bytes, ratio) per document; ratio =
    * deflated/raw (smaller = more compressible = more repetitive).
    * Empty documents get ratio 1.0 (nothing to judge).
    */
  def ratios(df: DataFrame, text: String, id: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    implicit val enc = Encoders.product[DocCompression]
    df.select(col(id).cast("long"), col(text)).mapPartitions { (it: Iterator[Row]) =>
      val deflater = new java.util.zip.Deflater(6)
      // free the native zlib state when the task ends (GC would get it
      // eventually; a 1000-executor scan shouldn't wait for finalizers)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
      it.map { r =>
        val bytes = Option(r.getString(1)).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = if (bytes.isEmpty) 0 else deflatedSize(deflater, bytes)
        DocCompression(r.getLong(0), bytes.length, out,
          if (bytes.isEmpty) 1.0 else out.toDouble / bytes.length)
      }
    }.toDF()
  }
}
