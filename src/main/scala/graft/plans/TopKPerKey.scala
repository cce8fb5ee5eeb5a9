package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator extension demo (SURVEY §4 preference order (c)):
  * top-k rows per key as a first-class operator —
  * LogicalPlan node → planner Strategy → physical exec — registered
  * through SparkSessionExtensions (GraftExtensions).
  *
  * Why it exists: the window spelling
  * `row_number().over(partitionBy(key).orderBy(x)) <= k` materializes
  * and fully sorts every group. This operator keeps only a k-bounded
  * heap per key: one shuffle on the key (declared via
  * requiredChildDistribution — Catalyst inserts the exchange), O(k)
  * memory per group, no sort of the long tail. At 100 TB the window
  * sort is the difference between a spill-storm and a single pass.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap w.r.t. the sort order: head = current worst of the k best
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, {
          val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
          heaps.put(key.copy(), h)
          h
        })
        if (heap.size < kk) heap += row.copy()
        else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
      }
      // dequeueAll emits worst-first; reverse for best-first per group
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top-k rows per key. `sortCols` are (column-name, descending?)
    * pairs, resolved eagerly against `df` (lazy unresolved columns
    * would survive analysis inside the custom node); include a unique
    * tiebreaker for deterministic boundaries. */
  def perKey(df: DataFrame, keyCols: Seq[String], sortCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val order = sortCols.map { case (c, desc) =>
      SortOrder(ColumnBridge.expression(df(c)), if (desc) Descending else Ascending)
    }
    val plan = TopKPerKeyPlan(
      keyCols.map(c => ColumnBridge.expression(df(c))),
      order, k, ColumnBridge.analyzedPlan(df))
    ColumnBridge.ofRows(df.sparkSession, plan)
  }
}
