package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}

/** Grouped top-k as a first-class operator (SURVEY.md §4 tier c — custom
  * LogicalPlan + Strategy + SparkPlan).
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * shuffles EVERY row and fully sorts every group, then discards all but k.
  * This operator keeps a bounded k-buffer per group:
  *
  *   partial (map side, before the exchange): each task retains at most k
  *   rows per group ⇒ shuffle volume is min(rows, k·groups·tasks), not rows;
  *   final (after hash partitioning on the group): exact top-k per group.
  *
  * Correct because the global top-k of a group is contained in the union of
  * per-partition top-ks. Output rows are unchanged (no rank column);
  * determinism comes from a total sort order (caller supplies tiebreakers).
  *
  * At 100 TB this is the difference between shuffling the fact table and
  * shuffling k rows per (group × task).
  *
  * MEMORY CAVEAT: TopKPass holds one k-buffer per distinct group seen by a
  * task in an in-memory map with no spill, so per-task memory is
  * O(groups_in_task × k × rowSize). That is the right trade when groups ≪
  * rows (the top-k-per-entity shape this operator exists for). When the
  * group key is high-cardinality (groups ≈ rows) the buffers approach the
  * input size and can OOM an executor where the window formulation would
  * sort-and-spill — prefer the window plan there, or pre-partition so each
  * task sees a bounded group count. (A spillable buffer map is the
  * follow-up if a real workload needs the high-cardinality case.)
  */
case class GroupedTopK(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
                       k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Shared bounded per-group selection pass. */
private[plans] object TopKPass {
  def run(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
          sortOrder: Seq[SortOrder], k: Int,
          output: Seq[Attribute]): Iterator[InternalRow] = {
    val groupProj = UnsafeProjection.create(groupExprs, output)
    val rowProj = UnsafeProjection.create(output, output)
    val ordering = RowOrdering.create(sortOrder, output)
    val buffers = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val buf = buffers.getOrElseUpdate(
        groupProj(row).copy(), new mutable.ArrayBuffer[UnsafeRow](k + 1))
      // skip early when the buffer is full and row sorts after the current kth
      if (buf.length < k || ordering.compare(row, buf.last) < 0) {
        val copied = rowProj(row).copy()
        var i = buf.length
        while (i > 0 && ordering.compare(copied, buf(i - 1)) < 0) i -= 1
        buf.insert(i, copied)
        if (buf.length > k) buf.remove(k)
      }
    }
    buffers.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side bounded pre-selection: no distribution requirement; shrinks
  * what the exchange has to move.
  */
case class GroupedTopKPartialExec(groupExprs: Seq[Expression],
                                  sortOrder: Seq[SortOrder], k: Int,
                                  child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKPass.run(_, groupExprs, sortOrder, k, output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKPartialExec =
    copy(child = newChild)
}

/** Exact per-group top-k after hash partitioning on the group keys.
  * Empty group keys = global top-k, which requires ALL rows in one
  * partition (AllTuples) — UnspecifiedDistribution would silently return
  * per-partition top-ks.
  */
case class GroupedTopKFinalExec(groupExprs: Seq[Expression],
                                sortOrder: Seq[SortOrder], k: Int,
                                child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKPass.run(_, groupExprs, sortOrder, k, output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKFinalExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(group, order, k, child) =>
      GroupedTopKFinalExec(group, order, k,
        GroupedTopKPartialExec(group, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Top-k rows per group, ordered by `(column name, descending?)` pairs —
    * must be a TOTAL order (include tiebreakers) for deterministic output.
    * Registers the planning strategy idempotently on the session.
    *
    * Sort orders are built as catalyst `SortOrder` directly (a
    * `Column.desc` travels as a Column-node SortOrder from
    * org.apache.spark.sql.internal, which is not task-serializable when
    * captured by a custom exec's closure).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val analyzed = df.queryExecution.analyzed
    val groupExprs: Seq[Expression] =
      groupCols.map(c => org.apache.spark.sql.graftbridge.ColumnBridge.expression(df(c)))
    val sortOrder: Seq[SortOrder] = orderBy.map { case (name, descending) =>
      SortOrder(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(df(name)),
        if (descending) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(
      spark, GroupedTopK(groupExprs, sortOrder, k, analyzed))
  }
}
