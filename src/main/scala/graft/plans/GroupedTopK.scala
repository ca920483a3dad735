package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Grouped top-k as a first-class operator (SURVEY §2.14 preference
  * (c): custom LogicalPlan + Strategy + SparkPlan).
  *
  * The built-in formulation — `row_number() over (partition by k order
  * by o) <= k` — SORTS every row of every group before discarding all
  * but k: at 100 TB that is a full sort shuffle of the table. This
  * operator keeps a bounded k-element heap per key after a hash
  * repartition (ClusteredDistribution — Catalyst inserts the
  * exchange), so memory per task is O(keys·k) regardless of group
  * size and nothing is sorted but the k survivors.
  *
  * Results match the window formulation exactly when `order` is a
  * total order (include a unique tiebreak column, as the reference's
  * rank queries do — reference: database/api_server.py:472,
  * my_scrapers/ventura_crawler.py:327-343).
  */
case class GroupedTopK(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

case class GroupedTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd = GenerateOrdering.generate(orderE, childOutput)
      // max-heap on the sort order: the head is the WORST survivor,
      // evicted when a better row arrives.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          scala.collection.mutable.PriorityQueue
            .empty[UnsafeRow](rowOrd.on((r: UnsafeRow) => r)))
        if (heap.size < limit) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec =
    copy(child = c)
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Top-k rows per key group, ordered by `orderCols` (first column
    * direction decides asc/desc via `descending`). Registers the
    * planner strategy on the session if absent.
    */
  def of(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int): DataFrame =
    PlanBridge.groupedTopK(df, keyCols, orderCols, descending, k)
}
