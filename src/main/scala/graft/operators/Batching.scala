package graft.operators

import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing — the batching step that turns a curated document
  * set into fixed-length training sequences (context windows) with
  * bounded padding waste; every large-scale LM data pipeline runs some
  * form of it between curation and the shard sink.
  *
  * Algorithm: next-fit-decreasing per hash bucket. Documents hash to
  * `bucketCount` independent packers (hash60(doc_id) % B — md5-derived,
  * so the DuckDB oracle reproduces the assignment exactly); within a
  * bucket, docs are ordered (n_tok DESC, doc_id) and walked once,
  * opening a new bin whenever the next doc would overflow `contextLen`.
  * Oversize docs are counted at `contextLen` (training truncates them).
  *
  * Why this shape at 100 TB:
  *  - ONE shuffle (groupByKey on bucket); each packer is a linear
  *    single-pass fold over its bucket — no global sort, no driver
  *    state, no cross-bucket coordination. `bucketCount` is the
  *    parallelism knob: size it so a bucket's (doc_id, n_tok) pairs —
  *    16 bytes each — fit a task comfortably (millions of docs/bucket).
  *  - Determinism is partition-independent: the bucket assignment and
  *    the within-bucket total order (n_tok desc, unique id) fix the
  *    output regardless of input partitioning — pinned as a law in
  *    OperatorsSpec and by the q173 DuckDB oracle (recursive-CTE replay
  *    of the same walk).
  *  - Packing quality: decreasing order makes next-fit behave close to
  *    first-fit-decreasing in practice while staying strictly
  *    sequential (no bin search state), and per-bucket independence
  *    costs nothing when every bucket holds thousands of docs.
  *
  * Returns one row per packed document:
  * (bucket, bin, doc_id, n_tok) — `bin` is bucket-local, 0-based.
  */
object Batching {

  def packSequences(docs: DataFrame, id: Column, tokens: Column,
                    contextLen: Long, bucketCount: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    require(bucketCount >= 1, s"bucketCount must be >= 1, got $bucketCount")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(id.cast("long").as("doc_id"),
        least(tokens.cast("long"), lit(contextLen)).as("n_tok"),
        pmod(graft.functions.hash60(id), lit(bucketCount.toLong))
          .as("bucket"))
      .where(col("n_tok") >= 1)
      .select(col("bucket"), col("doc_id"), col("n_tok"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val ds = it.map { case (_, d, n) => (d, n) }.toArray
        java.util.Arrays.sort(ds, (a: (Long, Long), b: (Long, Long)) =>
          if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
          else java.lang.Long.compare(a._1, b._1))
        val out = new Array[(Long, Long, Long, Long)](ds.length)
        var bin = 0L
        var acc = 0L
        var i = 0
        while (i < ds.length) {
          val (d, n) = ds(i)
          if (acc + n > contextLen) { bin += 1; acc = 0L }
          acc += n
          out(i) = (bucket, bin, d, n)
          i += 1
        }
        out.iterator
      }
      .toDF("bucket", "bin", "doc_id", "n_tok")
  }

  /** Per-bin packing audit on top of [[packSequences]]: fill, waste and
    * utilization of every context window — the padding-efficiency
    * numbers a batching change is judged by. One partial-agg exchange
    * over the packed rows.
    */
  def packingAudit(packed: DataFrame, contextLen: Long): DataFrame =
    packed.groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("fill_tokens"))
      .select(col("bucket"), col("bin"), col("n_docs"),
        col("fill_tokens"),
        (lit(contextLen) - col("fill_tokens")).as("waste_tokens"),
        round(col("fill_tokens").cast("double") / lit(contextLen.toDouble), 6)
          .as("util"))
}
