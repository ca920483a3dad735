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
    k: Int, child: LogicalPlan, partial: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

case class GroupedTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean = false)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** `partial` runs the heaps over whatever partitioning the child
    * already has (no exchange) and emits each partition's local top-k
    * per key — a map-side combine for top-k. A FINAL (clustered)
    * GroupedTopK downstream then reduces partitions x k candidates
    * per key to the true top-k, so the exchange between them moves
    * only candidates, never the full scored input.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val limit = k
    // Memory contract: the per-task hash map retains at most k rows per
    // DISTINCT key seen by the task — O(keys·k), with no spill path.
    // Rather than silently OOM a 100-TB task on a high-cardinality key,
    // fail loudly at the cap with the fix in the message. The cap
    // bounds retained ENTRIES (keys·k), the actual memory driver.
    val maxEntries = java.lang.Long.parseLong(conf.getConfString(
      GroupedTopK.maxEntriesKey, GroupedTopK.maxEntriesDefault.toString))
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd = GenerateOrdering.generate(orderE, childOutput)
      // max-heap on the sort order: the head is the WORST survivor,
      // evicted when a better row arrives.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      val maxKeys = math.max(1L, maxEntries / limit)
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null)
        val h = if (heap != null) heap else {
          if (heaps.size >= maxKeys) throw new org.apache.spark.SparkException(
            s"GroupedTopK: task exceeded ${GroupedTopK.maxEntriesKey}=" +
              s"$maxEntries retained entries ($maxKeys keys x k=$limit). " +
              "The grouping key cardinality is too high for the in-memory " +
              "heap formulation - use GroupedTopK.windowed (sort-based, " +
              "spill-safe) or raise the cap.")
          val nh = scala.collection.mutable.PriorityQueue
            .empty[UnsafeRow](rowOrd.on((r: UnsafeRow) => r))
          heaps.put(key.copy(), nh)
          nh
        }
        if (h.size < limit) {
          h.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, h.head) < 0) {
          h.dequeue()
          h.enqueue(row.asInstanceOf[UnsafeRow].copy())
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
    case GroupedTopK(g, o, k, child, partial) =>
      GroupedTopKExec(g, o, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Hard cap on heap entries (keys·k) retained by one GroupedTopKExec
    * task before it fails loudly instead of OOMing. At the 16M default
    * with ~64-byte rows that is ~1 GiB of task memory, inside a typical
    * executor's working set.
    */
  val maxEntriesKey = "spark.graft.topk.maxEntriesPerTask"
  val maxEntriesDefault: Long = 16L * 1024 * 1024

  /** Top-k rows per key group, ordered by `orderCols` (first column
    * direction decides asc/desc via `descending`). Registers the
    * planner strategy on the session if absent.
    *
    * Memory contract: O(distinct keys per task × k) with no spill —
    * right when key cardinality is bounded (venues, languages, shard
    * ids), guarded by [[maxEntriesKey]] when it isn't. For unbounded /
    * unknown cardinality use [[windowed]] (same results, sort-based,
    * spills).
    */
  def of(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int): DataFrame =
    PlanBridge.groupedTopK(df, keyCols, orderCols, descending, k)

  /** Map-side-combined top-k: a PARTIAL per-partition heap pass (no
    * exchange — runs on the child's existing partitioning) followed by
    * the clustered FINAL pass. The exchange between the two carries at
    * most partitions × keys × k candidate rows instead of the full
    * scored input — the top-k analog of partial aggregation. Use when
    * the input is large relative to keys × k (e.g. a k-NN join's
    * corpus × queries score stream).
    */
  def combined(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int): DataFrame =
    of(PlanBridge.groupedTopK(df, keyCols, orderCols, descending, k,
        partial = true),
      keyCols, orderCols, descending, k)

  /** The spill-safe formulation of the same operator: row_number over a
    * (key, order) sort — Spark's external sort spills to disk, so any
    * key cardinality is safe at the cost of sorting whole groups. Same
    * output as [[of]] when the order (plus tiebreak columns) is total.
    */
  def windowed(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val order = orderCols.map(c => if (descending) col(c).desc else col(c).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_gtk_rn", row_number().over(w))
      .filter(col("_gtk_rn") <= k)
      .drop("_gtk_rn")
  }

  /** Picks the formulation from an estimated key cardinality: the heap
    * operator while `estimatedKeys × k` stays comfortably under the
    * per-task cap × shuffle parallelism, the windowed fallback beyond
    * it. The 4× headroom covers hash skew (a task holding a multiple of
    * the average key share) and AQE coalescing fewer real tasks than
    * configured — the cap is enforced PER TASK, so a selector sized to
    * the exact average would pick a plan one skewed task can still
    * fail.
    */
  def ofSafe(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int, estimatedKeys: Long): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val cap = java.lang.Long.parseLong(
      conf.getConfString(maxEntriesKey, maxEntriesDefault.toString))
    val tasks = math.max(1, conf.numShufflePartitions)
    val headroom = 4L
    // division compare: `estimatedKeys / tasks * k * headroom` can
    // overflow Long for extreme estimatedKeys×k (going negative and
    // picking the heap plan for exactly the worst inputs)
    if (estimatedKeys / tasks <= cap / math.max(1L, k.toLong * headroom))
      of(df, keyCols, orderCols, descending, k)
    else windowed(df, keyCols, orderCols, descending, k)
  }
}
