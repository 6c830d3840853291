package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Decoded, Payload, StubCodec}
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing: binary columns, metadata structs, batch
  * decode via mapPartitions (codec stubbed — see Multimodal scaladoc).
  */
class MultimodalSpec extends SparkSpec {

  test("payload metadata is computed from the bytes and binary-typed") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "wörld")).toDF("id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val m = df.select(col("id"),
      Multimodal.payloadMetadata(col("payload"), "image").as("meta"))
      .select("id", "meta.size_bytes", "meta.checksum").collect()
    assert(m.find(_.getLong(0) == 1L).get.getInt(1) == 5)
    assert(m.find(_.getLong(0) == 2L).get.getInt(1) == 6) // ö is 2 bytes
    assert(m.forall(_.getString(2).length == 32))
  }

  test("stub codec is deterministic and batch decode preserves rows") {
    import spark.implicits._
    val payloads = (1L to 100L)
      .map(i => Payload(i, "image", s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(payloads).repartition(7)
    val out = Multimodal.decodeBatches(ds).collect().sortBy(_.id)
    assert(out.length == 100)
    // deterministic: same bytes → same decode
    val again = Multimodal.decodeBatches(ds).collect().sortBy(_.id)
    assert(out.map(d => (d.id, d.width, d.height, d.channels)).toSeq ==
      again.map(d => (d.id, d.width, d.height, d.channels)).toSeq)
    // plausible stub ranges + fixed feature width
    assert(out.forall(d => d.width >= 16 && d.width < 1024))
    assert(out.forall(d => Set(1, 3, 4)(d.channels)))
    assert(out.forall(_.feature.length == 8))
    // local check: codec applied rowwise
    val one = StubCodec(payloads.head)
    assert(out.head == one.copy(feature = out.head.feature) ||
      out.head.width == one.width)
  }

  test("frame sampling explodes evenly spaced timestamps") {
    import spark.implicits._
    val df = Seq((1L, 8.0), (2L, 2.0)).toDF("id", "dur")
    val f = Multimodal.frameSample(df, col("id"), col("dur"), n = 4)
      .orderBy("id", "frame_idx").collect()
    assert(f.length == 8)
    assert(f.filter(_.getLong(0) == 1L).map(_.getDouble(3)).toSeq ==
      Seq(0.0, 2.0, 4.0, 6.0))
  }

  test("resize plan preserves aspect ratio toward short side 224") {
    import spark.implicits._
    val df = Seq((100, 200), (640, 320)).toDF("width", "height")
      .withColumn("dims", struct(col("width"), col("height")))
    val r = df.select(col("width"),
      Multimodal.resizePlan(col("dims"), 224).as("r"))
      .select("width", "r.width", "r.height").collect()
    assert(r.find(_.getInt(0) == 100).get.getInt(1) == 224) // portrait: w→224
    assert(r.find(_.getInt(0) == 100).get.getInt(2) == 448)
    assert(r.find(_.getInt(0) == 640).get.getInt(2) == 224) // landscape: h→224
    assert(r.find(_.getInt(0) == 640).get.getInt(1) == 448)
  }
}
