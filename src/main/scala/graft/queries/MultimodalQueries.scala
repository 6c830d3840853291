package graft.queries

import graft.Engine
import graft.{functions => gf}
import graft.operators.Multimodal
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Multimodal-column coverage over `documents` used as the payload
  * corpus: text bytes stand in for opaque media payloads (the container
  * ships no codecs — see [[graft.operators.Multimodal]] for what is
  * stubbed vs real). Everything here is binary-typed on the Spark side
  * and reproduced by DuckDB over the same bytes.
  */
object MultimodalQueries {

  import OracleSql.{sqlHash56, sqlHash60}

  val defs: Seq[(String, QueryDef)] = Seq(

    // Payload ingest: binary column + typed metadata struct (modality,
    // size, checksum) + stub-decoded dimensions. Metadata is computed
    // once here; downstream projections never touch the bytes again.
    "q40_payload_metadata" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8"))
        val dims = Multimodal.stubImageDims(col("payload"))
        d.select(col("doc_id"),
          Multimodal.payloadMetadata(col("payload"), "image").as("meta"),
          dims.as("dims"))
          .select(col("doc_id"),
            col("meta.modality").as("modality"),
            col("meta.size_bytes").cast("long").as("size_bytes"),
            col("meta.checksum").as("checksum"),
            col("dims.width").as("width"),
            col("dims.height").as("height"),
            col("dims.channels").as("channels"))
      },
      oracle = Some(s"""
        SELECT doc_id,
               'image' AS modality,
               octet_length(encode(text)) AS size_bytes,
               md5(text) AS checksum,
               CAST(16 + ${sqlHash60("text")} % 1008 AS INTEGER) AS width,
               CAST(16 + ${sqlHash56("text")} % 1008 AS INTEGER) AS height,
               CAST([1, 3, 4][CAST(${sqlHash60("text")} % 3 AS INTEGER) + 1] AS INTEGER) AS channels
        FROM documents"""),
      headline = true),

    // Resize planning: aspect-preserving short-side-to-224 metadata
    // arithmetic over the stub-decoded dimensions.
    "q41_resize_plan" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .withColumn("dims", Multimodal.stubImageDims(col("payload")))
        d.select(col("doc_id"),
          col("dims.width").as("width"), col("dims.height").as("height"),
          Multimodal.resizePlan(col("dims"), 224).as("r"))
          .select(col("doc_id"), col("width"), col("height"),
            col("r.width").as("out_width"), col("r.height").as("out_height"))
      },
      oracle = Some(s"""
        WITH dims AS (
          SELECT doc_id,
                 CAST(16 + ${sqlHash60("text")} % 1008 AS INTEGER) AS width,
                 CAST(16 + ${sqlHash56("text")} % 1008 AS INTEGER) AS height
          FROM documents)
        SELECT doc_id, width, height,
               CAST(CASE WHEN width <= height THEN 224
                    ELSE round(width * 224.0 / height) END AS INTEGER) AS out_width,
               CAST(CASE WHEN width <= height THEN round(height * 224.0 / width)
                    ELSE 224 END AS INTEGER) AS out_height
        FROM dims""")),

    // Video frame sampling: 4 evenly spaced frame timestamps per payload
    // via sequence+posexplode — row explosion without a UDF.
    "q42_frame_sample" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
          .withColumn("duration_s", (lit(1) + pmod(col("n_chars"), lit(120))).cast("double"))
        Multimodal.frameSample(d, col("doc_id"), col("duration_s"), n = 4)
          .withColumnRenamed("id", "doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(1 + n_chars % 120 AS DOUBLE) AS duration_s,
               CAST(f AS INTEGER) AS frame_idx,
               round((1 + n_chars % 120) * f / 4.0, 3) AS frame_ts,
               md5(doc_id::VARCHAR || ':' || f::VARCHAR) AS frame_checksum
        FROM documents, generate_series(0, 3) AS t(f)"""),
      headline = false),

    // REAL PNG header decode through the production decode path: each
    // document deterministically yields a well-formed PNG signature+IHDR
    // byte string (width/height/color-type derived from the text hash),
    // and Multimodal.PngCodec parses the DIMENSIONS BACK OUT OF THE RAW
    // BYTES via decodeBatches — the per-partition batch plumbing a real
    // image corpus rides. The oracle rebuilds the identical bytes in
    // DuckDB and parses them with substring/hex arithmetic, so both
    // engines go bytes → dims; neither shortcuts from the generator
    // params. (Construction is in-query because testdata ships no binary
    // image column; the codec itself never sees the generator params.)
    "q174_png_header" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val hx8 = (c: org.apache.spark.sql.Column) => lpad(hex(c.cast("long")), 8, "0")
        val w = lit(16) + pmod(gf.hash60(col("text")), lit(1000))
        val h = lit(16) + pmod(gf.hash56b(col("text")), lit(1000))
        val colorType = element_at(
          array(lit(0), lit(2), lit(3), lit(4), lit(6)),
          (pmod(gf.hash60(col("text")), lit(5)) + 1).cast("int"))
        val png = unhex(concat(
          lit("89504E470D0A1A0A"), // signature
          lit("0000000D49484452"), // IHDR length=13 + type
          hx8(w), hx8(h),          // width, height (4-byte BE each)
          lit("08"), lpad(hex(colorType.cast("long")), 2, "0"),
          lit("000000")))          // bit depth 8; compression/filter/interlace
        val payloads = Engine.table(s, dir, "documents")
          .select(col("doc_id").as("id"), lit("image").as("modality"),
            png.as("content")).as[Multimodal.Payload]
        Multimodal.decodeBatches(payloads, Multimodal.PngCodec).toDF()
          .select(col("id").as("doc_id"), col("width"), col("height"),
            col("channels"))
      },
      oracle = Some(s"""
        WITH p AS (
          SELECT doc_id, concat(
              '89504E470D0A1A0A', '0000000D49484452',
              lpad(hex(16 + ${sqlHash60("text")} % 1000), 8, '0'),
              lpad(hex(16 + ${sqlHash56("text")} % 1000), 8, '0'),
              '08',
              lpad(hex([0, 2, 3, 4, 6][CAST(${sqlHash60("text")} % 5 AS INTEGER) + 1]), 2, '0'),
              '000000') AS png_hex
          FROM documents),
        b AS ( -- round-trip through BLOB so the oracle parses BYTES, not its own hex
          SELECT doc_id, hex(from_hex(png_hex)) AS hx FROM p)
        SELECT doc_id,
               CAST(CAST(concat('0x', substr(hx, 33, 8)) AS BIGINT) AS INTEGER) AS width,
               CAST(CAST(concat('0x', substr(hx, 41, 8)) AS BIGINT) AS INTEGER) AS height,
               CAST(CASE CAST(concat('0x', substr(hx, 51, 2)) AS BIGINT)
                    WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
                    WHEN 4 THEN 2 WHEN 6 THEN 4 END AS INTEGER) AS channels
        FROM b"""))
  )
}
