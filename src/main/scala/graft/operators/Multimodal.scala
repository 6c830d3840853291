package graft.operators

import graft.{functions => gf}
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}

/** Multimodal (image/audio/video) columns for the 100 TB training-data
  * pipeline: payloads are opaque `binary` columns travelling WITH their
  * typed metadata struct; decode/feature-extraction runs per-partition in
  * batch (the Scala analog of `mapInPandas` batches).
  *
  * CODECS ARE STUBBED: this container ships no image/audio libraries, so
  * [[StubCodec]] derives deterministic fake dimensions/features from the
  * payload's md5 — clearly marked, swap-in point is the single [[Codec]]
  * function. Everything AROUND the codec — schema, binary handling,
  * batch shape, partition sizing, metadata propagation — is real and
  * tested, which is the part that has to survive a 1000-executor run.
  *
  * Scale notes: payload columns make rows wide; keep
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * payloads fits executor memory, and select metadata-only projections
  * (parquet column pruning drops the bytes entirely) whenever the
  * payload isn't needed.
  */
object Multimodal {

  // ------------------------------------------------------------ metadata

  /** Typed metadata for an opaque payload: computed ONCE at ingest from
    * the bytes themselves, then carried as a struct so downstream stages
    * never re-read the binary (parquet prunes it away).
    */
  def payloadMetadata(payload: Column, modality: String): Column =
    struct(
      lit(modality).as("modality"),
      octet_length(payload).as("size_bytes"),
      md5(payload).as("checksum"))

  /** Deterministic fake image dimensions from the payload hash — the STUB
    * standing in for a real header parse. 16..1023 × 16..1023, 1/3/4
    * channels.
    */
  def stubImageDims(payload: Column): Column = {
    val h = gf.hash60(payload.cast(StringType))
    struct(
      (lit(16) + pmod(h, lit(1008))).cast(IntegerType).as("width"),
      (lit(16) + pmod(gf.hash56b(payload.cast(StringType)), lit(1008))).cast(IntegerType).as("height"),
      element_at(array(lit(1), lit(3), lit(4)), (pmod(h, lit(3)) + 1).cast(IntegerType))
        .as("channels"))
  }

  /** Resize plan: target the short side to `target` px preserving aspect
    * ratio — pure metadata arithmetic (the byte-level resample is codec
    * work); emitted as the instruction set a decode stage executes.
    */
  def resizePlan(dims: Column, target: Int): Column = {
    val w = dims.getField("width")
    val h = dims.getField("height")
    val scaleToW = struct(lit(target).cast(IntegerType).as("width"),
      round(h.cast(DoubleType) * target / w).cast(IntegerType).as("height"))
    val scaleToH = struct(round(w.cast(DoubleType) * target / h).cast(IntegerType).as("width"),
      lit(target).cast(IntegerType).as("height"))
    when(w <= h, scaleToW).otherwise(scaleToH)
  }

  /** Frame sampling for video payloads: `n` evenly spaced timestamps over
    * `durationS` seconds — one output row per (payload, frame index),
    * via sequence+posexplode (no UDF, stays in codegen). The actual frame
    * decode at each ts is codec work (stubbed checksum per frame).
    */
  def frameSample(df: DataFrame, id: Column, durationS: Column, n: Int): DataFrame =
    df.select(id.as("id"), durationS.as("duration_s"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_f")))
      .drop("_f")
      .withColumn("frame_ts", round(col("duration_s") * col("frame_idx") / n, 3))
      .withColumn("frame_checksum",
        md5(concat(col("id").cast(StringType), lit(":"), col("frame_idx").cast(StringType))))

  // ---------------------------------------------- batch decode plumbing

  /** One payload row entering the decode stage. */
  case class Payload(id: Long, modality: String, content: Array[Byte])

  /** One decoded feature row leaving it. */
  case class Decoded(id: Long, modality: String, width: Int, height: Int,
                     channels: Int, feature: Array[Float])

  /** A codec turns one payload into decoded features. Swap the stub for a
    * real implementation (javax.imageio, ffmpeg bindings, …) here — the
    * pipeline around it does not change.
    */
  type Codec = Payload => Decoded

  private def md5Feature(content: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    (0 until 8).map(i => ((d(i) & 0xff) / 255.0f)).toArray
  }

  /** STUB codec: md5-derived dimensions + an 8-dim fake feature vector.
    * Deterministic in the payload bytes, so tests and oracles can pin it.
    */
  val StubCodec: Codec = { p =>
    val d = java.security.MessageDigest.getInstance("MD5").digest(p.content)
    def u(i: Int) = d(i) & 0xff
    Decoded(p.id, p.modality,
      width = 16 + ((u(0) << 8 | u(1)) % 1008),
      height = 16 + ((u(2) << 8 | u(3)) % 1008),
      channels = Array(1, 3, 4)(u(4) % 3),
      feature = md5Feature(p.content))
  }

  /** REAL codec for PNG payloads: byte-level header parse, no library.
    * PNG layout (the public spec): 8-byte signature
    * `89 50 4E 47 0D 0A 1A 0A`, then chunks, the first of which MUST be
    * IHDR — 4-byte big-endian length (13), "IHDR", 4-byte BE width,
    * 4-byte BE height, bit depth, color type, compression, filter,
    * interlace. Channels derive from color type: 0 grayscale→1,
    * 2 truecolor→3, 3 palette(index)→1, 4 gray+alpha→2, 6 RGBA→4.
    *
    * This is the production posture for 100 TB of image payloads:
    * dimensions/channels come from reading 26 header bytes, never from
    * decompressing pixel data. Non-PNG payloads fall back to
    * [[StubCodec]] (the sandbox ships no other codecs); the feature
    * vector stays the stub's md5 embedding in both arms, so mixed
    * corpora keep one feature space.
    */
  val PngCodec: Codec = { p =>
    val b = p.content
    def u(i: Int) = b(i) & 0xff
    val isPng = b.length >= 26 &&
      u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4E && u(3) == 0x47 &&
      u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A &&
      u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
    if (!isPng) StubCodec(p)
    else {
      def be32(i: Int) = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
      val channels = u(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0 // corrupt color type: surface as 0, don't guess
      }
      Decoded(p.id, p.modality, width = be32(16), height = be32(20),
        channels = channels, feature = md5Feature(b))
    }
  }

  /** Batch decode: per-partition iteration (one codec instance per
    * partition, amortized setup — the Scala analog of a `mapInPandas`
    * batch loop). Input partitioning is preserved; repartition by
    * byte-size upstream if payload sizes are skewed.
    */
  def decodeBatches(payloads: Dataset[Payload], codec: Codec = StubCodec): Dataset[Decoded] = {
    implicit val enc = Encoders.product[Decoded]
    payloads.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map(codec)
    }
  }
}
