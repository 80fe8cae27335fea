package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator per-group top-k — tier (c) of the extension ladder: a
  * custom LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `GraftExtensions`.
  *
  * The window form (`row_number over (partition by g order by o)`,
  * filter ≤ k) SORTS every group's full row set after the shuffle; the
  * salted window form bounds the sort but still sorts. This operator
  * never sorts more than k rows: each task streams its partition once,
  * maintaining a bounded insertion buffer per group (the
  * `TopKByScore`-Aggregator idea promoted to a whole physical
  * operator). Top-k is a semilattice, so the strategy plans two phases
  * — a PARTIAL pass over whatever partitioning arrives (each task
  * keeps its local top-k per group, shrinking the shuffle to ≤
  * tasks·groups·k rows) and a FINAL pass that declares
  * `ClusteredDistribution(group)` so `EnsureRequirements` inserts the
  * one hash exchange.
  *
  * Contract: a task's in-flight state is O(groups-in-task × k) rows —
  * the right operator when k is small and group cardinality fits
  * memory per task; for million-group × large-k shapes, use the salted
  * window form. Output rows are the kept child rows (no rank column),
  * in no particular order — semantics pinned against the window form
  * in `TopKExecSpec`.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  require(groupExprs.nonEmpty, "per-group top-k needs group expressions")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial exec → (exchange) → final exec. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int, partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, schema) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, schema)
      val ordering = RowOrdering.create(o, schema)
      // insertion-sorted bounded buffer per group (k is small by
      // contract; O(k) insert beats heap constant factors at that size)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var buf = heaps.get(key)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[InternalRow](kk + 1)
          heaps.put(key.copy(), buf)
        }
        if (buf.length < kk || ordering.lt(row, buf.last)) {
          val copied = row.copy()
          val idx = buf.indexWhere(e => ordering.lt(copied, e))
          if (idx < 0) buf.append(copied) else buf.insert(idx, copied)
          if (buf.length > kk) buf.remove(kk)
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }
}
