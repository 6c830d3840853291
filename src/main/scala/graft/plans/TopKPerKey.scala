package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY.md §2.10 path (c):
  * custom LogicalPlan + Strategy + SparkPlan, injected via
  * `SparkSessionExtensions` / `experimental.extraStrategies`).
  *
  * Spark's built-ins offer only GLOBAL top-k (`TakeOrderedAndProject`);
  * the per-key form is spelled `row_number().over(window) <= k`, whose
  * physical plan fully sorts every key group before discarding all but
  * k rows. This operator keeps a k-bounded heap per key instead —
  * O(n log k) per partition, no sort buffer, no spill pressure from
  * rows that can never survive — the shape that matters when a 100 TB
  * corpus keeps 3 candidates per query vector out of millions.
  *
  * Semantics: for each distinct value of `keys`, emit the first k rows
  * of the child under `order` (ties must be broken by the caller's
  * ordering columns for determinism, as with any window rank). Rows
  * within a key are emitted in `order`; the window+filter form is the
  * executable spec (`Relational.topKPerKeyComposed`), equivalence
  * pinned in `OperatorsSpec` and by the q105 oracle.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a key must land in one partition; EnsureRequirements
    * inserts the single hash exchange this operator ever needs.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(kExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      val revCmp = ord.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]]
      // per key: a max-heap (reverse ordering) of the k best rows seen,
      // head = current worst survivor → O(log k) replace decision
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, revCmp)
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans the logical node; injected via `GraftExtensions` (cluster
  * submit) or `spark.experimental.extraStrategies` (live session).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
