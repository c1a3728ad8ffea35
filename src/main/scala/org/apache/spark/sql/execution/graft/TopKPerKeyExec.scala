package org.apache.spark.sql.execution.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession, Strategy}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Group-wise top-k as a first-class operator: for each group key, the
  * first `k` rows under `order`.
  *
  * Spark expresses this as `row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`, whose physical plan SORTS EVERY ROW of every partition
  * (shuffle → per-partition full sort → window walk → filter). This
  * operator keeps a bounded heap of k rows per key instead: O(n log k)
  * with k rows of state per key, versus O(n log n) and n rows materialized
  * in the sort. At 100 TB with small k this removes the dominant sort
  * entirely (spill included); the shuffle on the group key remains, as it
  * must.
  *
  * The logical node carries resolved expressions; the strategy pattern-
  * matches it; the exec declares `ClusteredDistribution(keys)` so the
  * planner inserts the hash shuffle (AQE still manages partition counts).
  * This file lives under the Spark namespace because the physical-plan
  * APIs it needs (`UnaryExecNode`, distributions, `Dataset.ofRows`) are
  * `private[sql]` — the standard arrangement for Spark extension
  * operators.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of one key must meet in one partition — the planner
    * inserts the hash-partitioned exchange to satisfy this. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val orderCopy = order
    val keysCopy = keys
    val kCopy = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keysCopy, schema)
      val ordering = new LazilyGeneratedOrdering(orderCopy, schema)
      // max-heap under the sort order: head = worst row kept → O(log k)
      // membership test + eviction per incoming row
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kCopy) {
          heap.enqueue(row.copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.toSeq.sorted(ordering)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** `private[sql]` bridge so the public graft API can materialize a
  * DataFrame from the custom logical node. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Eager Column → catalyst Expression conversion (the lazy
    * `ColumnNodeExpression` wrapper keeps non-serializable internal sort
    * nodes alive into the physical plan). */
  def expr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Reverse direction: wrap a catalyst Expression as a public Column
    * (for operators built on Spark-internal expressions, e.g. the Bloom
    * filter sketch pair). */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
