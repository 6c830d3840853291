package graft

import graft.{functions => gf}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = Engine.table(spark, sfDir, "documents")
    d.cache().count()

    time("warmup noop")(d.write.format("noop").mode("overwrite").save())

    time("shingles explode only") {
      d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles no-distinct") {
      val toks = split(col("text"), " ")
      val arr = transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3)))
      d.select(col("doc_id"), explode(arr).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles hash-in-array explode structs") {
      val hashed = transform(Dedup.shingles(col("text"), 3),
        sh => struct(gf.hash60(sh).as("h1"), gf.hash56b(sh).as("h2")))
      d.select(col("doc_id"), explode(hashed).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles + md5 hashes") {
      d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(col("doc_id"), gf.hash60(col("sh")).as("h1"), gf.hash56b(col("sh")).as("h2"))
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash signatures") {
      Dedup.minHashSignatures(d, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full lsh pairs") {
      Dedup.minHashLshPairs(d, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full lsh pairs again") {
      Dedup.minHashLshPairs(d, col("text"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
