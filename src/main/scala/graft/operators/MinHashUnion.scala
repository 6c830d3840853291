package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` — the custom-UDAF extension point of
  * SURVEY.md §2.10, instantiated for the one aggregate the training-data
  * pipeline genuinely needs beyond the built-ins: the MERGEABLE union of
  * MinHash signatures.
  *
  * A MinHash signature is a k-vector of minima over a document's hashed
  * shingle set; the signature of a UNION of documents is the element-wise
  * min of their signatures. That makes this aggregate associative and
  * commutative, so it is exact under Spark's partial-aggregation plan
  * (map-side `reduce`, shuffle one k-vector per group per partition,
  * `merge` on the reduce side) and its output is bit-identical at any
  * partitioning — the same order-independence argument as ExactAgg, here
  * by construction rather than by integerization.
  *
  * Uses: cluster-level signatures (estimate Jaccard between whole dup
  * clusters or sources without re-shingling), and the persisted
  * signature store of the incremental dedup gate — fold today's batch
  * into the running per-shard signature with one aggregate.
  *
  * At 100 TB: per-group state is a fixed k longs regardless of group
  * size, the textbook mergeable-sketch shape (same scaling class as HLL
  * in q47 and GK in q81).
  */
object MinHashUnion extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {

  /** Empty-signature sentinel: dropped on first merge. */
  def zero: Seq[Long] = Seq.empty

  def reduce(b: Seq[Long], a: Seq[Long]): Seq[Long] = union(b, a)

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = union(b1, b2)

  def finish(r: Seq[Long]): Seq[Long] = r

  private def union(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"signature widths differ: ${x.length} vs ${y.length}")
      Seq.tabulate(x.length)(i => math.min(x(i), y(i)))
    }

  def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column-API handle: `df.groupBy(...).agg(MinHashUnion(col("sigs")))`. */
  def apply(sigs: Column): Column = udaf(this).apply(sigs)
}
