package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key — a whole-operator extension (SURVEY §7.4 tier c:
  * LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions).
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k`) shuffles EVERY row to its key's partition and
  * sorts whole partitions. This operator runs in two phases, like
  * Spark's own partial aggregation:
  *
  *   partial: per input partition, a bounded heap per key → at most k
  *            rows per (partition, key) enter the exchange;
  *   final:   clustered on key, merge heaps → exact top-k.
  *
  * At 100 TB the shuffle shrinks from O(rows) to O(partitions·keys·k) —
  * for the ANN rerank (millions of candidates, 5 queries, k=10) that is
  * the difference between shuffling the corpus and shuffling kilobytes.
  * Results are identical to the window formulation (same comparator,
  * deterministic for total orderings); verified against the DuckDB
  * oracle by t_topk_operator.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // rows stay where the child put them — declaring this lets downstream
  // key-clustered operators (e.g. a rank window on the same key) reuse
  // the exchange instead of shuffling the k·keys survivors again
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.generate(sortOrder, childOutput)
      // per key: bounded heap holding the k FIRST rows under the
      // ordering (max-heap on the comparator, evict the worst). Heaps
      // hold InternalRow — only the key needs UnsafeRow (map equality);
      // a non-codegen child may emit GenericInternalRow copies.
      val heaps = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      rows.foreach { r =>
        val key = keyProj(r).copy()
        val heap = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[InternalRow](
            (a, b) => cmp.compare(a, b)))
        if (heap.size < limit) heap.enqueue(r.copy())
        else if (cmp.compare(r, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(r.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
