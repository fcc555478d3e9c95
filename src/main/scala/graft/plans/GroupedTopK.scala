package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}

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
  * MEMORY: the partial pass tracks at most `PartialMaxGroups` groups per
  * task — rows of further groups stream through to the exchange unfiltered
  * (correct; only the pre-selection benefit is lost for the overflow
  * groups) — so map-side memory is strictly bounded at high group
  * cardinality. The final pass requires a (group, order) child ordering —
  * Spark's spillable SortExec over the ALREADY-REDUCED post-exchange set —
  * and streams group boundaries with O(1) state, so no stage of the
  * operator holds unbounded per-group structures.
  */
case class GroupedTopK(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
                       k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Shared bounded per-group selection pass.
  *
  * `maxGroups` caps the tracked-group map. Rows of groups BEYOND the cap
  * stream through unfiltered (`passthrough`) instead of being buffered —
  * legal wherever the pass is a pre-selection in front of an exact
  * consumer, because forwarding extra rows never changes a top-k. With the
  * cap, memory is strictly O(maxGroups × k × rowSize) regardless of group
  * cardinality. The exact final pass runs with maxGroups = ∞ (it must see
  * every group; its memory is groups-per-PARTITION × k, sized by the
  * shuffle partition count).
  */
private[plans] object TopKPass {
  def run(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
          sortOrder: Seq[SortOrder], k: Int, output: Seq[Attribute],
          maxGroups: Int = Int.MaxValue): Iterator[InternalRow] = {
    val groupProj = UnsafeProjection.create(groupExprs, output)
    val rowProj = UnsafeProjection.create(output, output)
    val ordering = RowOrdering.create(sortOrder, output)
    val buffers = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]]

    // lazily interleave: overflow-group rows are emitted the moment they
    // arrive (never stored); buffered top-ks drain after input is exhausted
    val passthrough: Iterator[InternalRow] = new Iterator[InternalRow] {
      private var pending: InternalRow = _
      private def advance(): Unit = {
        while (pending == null && iter.hasNext) {
          val row = iter.next()
          val key = groupProj(row)
          val existing = buffers.get(key)
          if (existing.isEmpty && buffers.size >= maxGroups) {
            pending = rowProj(row).copy() // untracked group: forward as-is
          } else {
            val buf = existing.getOrElse {
              val b = new mutable.ArrayBuffer[UnsafeRow](k + 1)
              buffers.put(key.copy(), b)
              b
            }
            // skip early when full and row sorts after the current kth
            if (buf.length < k || ordering.compare(row, buf.last) < 0) {
              val copied = rowProj(row).copy()
              var i = buf.length
              while (i > 0 && ordering.compare(copied, buf(i - 1)) < 0) i -= 1
              buf.insert(i, copied)
              if (buf.length > k) buf.remove(k)
            }
          }
        }
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): InternalRow = {
        advance(); val r = pending; pending = null; r
      }
    }
    passthrough ++ buffers.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side bounded pre-selection: no distribution requirement; shrinks
  * what the exchange has to move. Memory-capped — beyond
  * `PartialMaxGroups` tracked groups per task, rows pass through to the
  * exchange unfiltered (correct: the final pass is exact).
  */
case class GroupedTopKPartialExec(groupExprs: Seq[Expression],
                                  sortOrder: Seq[SortOrder], k: Int,
                                  child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKPass.run(_, groupExprs, sortOrder, k, output,
        GroupedTopKPartialExec.PartialMaxGroups),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKPartialExec =
    copy(child = newChild)
}

object GroupedTopKPartialExec {
  /** Tracked-group cap per partial task: 100k groups × k rows of buffer is
    * a few hundred MB at most for wide rows, far under executor memory,
    * while still collapsing the common groups≪rows workloads completely.
    */
  val PartialMaxGroups: Int = 100000
}

/** Exact per-group top-k after hash partitioning on the group keys.
  * Empty group keys = global top-k, which requires ALL rows in one
  * partition (AllTuples) — UnspecifiedDistribution would silently return
  * per-partition top-ks.
  *
  * SPILL-SAFE: declares requiredChildOrdering (group keys, then the sort
  * order), so Spark inserts its spillable SortExec on the post-partial,
  * post-exchange row set — at most ~k·groups·tasks rows plus partial-cap
  * passthrough, far smaller than the input. The pass itself is then a
  * streaming group-boundary scan emitting the first k rows per group with
  * O(1) state — final-side memory no longer depends on group cardinality
  * at all (the earlier in-memory buffer map held groups-per-partition × k
  * rows with no spill).
  */
case class GroupedTopKFinalExec(groupExprs: Seq[Expression],
                                sortOrder: Seq[SortOrder], k: Int,
                                child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // pass the exchange's hash partitioning through (output == child.output,
  // so its expressions stay resolvable): a downstream aggregate on the
  // SAME group keys then reuses the partitioning instead of inserting a
  // redundant exchange — the default UnknownPartitioning cost q281's
  // basket collect a third full shuffle of the corpus pairs
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) ++ sortOrder)
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprs, output)
      // boundary detection must use the SAME equivalence as the sort, not
      // UnsafeRow byte equality: float keys have distinct bit patterns that
      // the ordering treats as equal (NaN representations, -0.0 vs 0.0), and
      // byte-comparing them would reset the counter mid-group and over-emit
      val keyAttrs = groupExprs.zipWithIndex.map { case (e, i) =>
        AttributeReference(s"k$i", e.dataType, e.nullable)()
      }
      val keyOrdering = RowOrdering.create(
        keyAttrs.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
        keyAttrs)
      new Iterator[InternalRow] {
        private var currentKey: UnsafeRow = _
        private var emitted = 0
        private var pending: InternalRow = _
        private def advance(): Unit = {
          while (pending == null && iter.hasNext) {
            val row = iter.next()
            val key = groupProj(row)
            if (currentKey == null || keyOrdering.compare(key, currentKey) != 0) {
              currentKey = key.copy()
              emitted = 0
            }
            if (emitted < k) { emitted += 1; pending = row }
          }
        }
        // `pending` is handed out WITHOUT copying: advance() only pulls the
        // next (memory-reusing) sorter row after the previous one has been
        // consumed, which is the standard SparkPlan iterator contract (same
        // as SortExec's output) — any consumer that buffers rows across
        // next() calls must copy them itself. The partial pass, by
        // contrast, copies because it buffers rows internally.
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): InternalRow = {
          advance(); val r = pending; pending = null; r
        }
      }
    }, preservesPartitioning = true)
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

  /** Install the SQL-facing engine pieces on an EXISTING session (the
    * non-`spark.sql.extensions` path, mirroring what [[graft.GraftExtensions]]
    * injects at session build time): the GroupedTopK planning strategy and
    * the [[RowNumberTopKRewrite]] optimizer rule, so SQL-authored
    * `row_number() ... WHERE rn <= k` top-k idioms replan as the native
    * bounded-buffer operator. Idempotent; the rewrite is
    * semantics-preserving (see its scaladoc), so session-wide installation
    * is safe — it is exactly how a production `spark.sql.extensions`
    * deployment behaves.
    */
  private def registerStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy

  def installSqlExtensions(spark: org.apache.spark.sql.SparkSession): Unit = {
    registerStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(RowNumberTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
  }

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
    registerStrategy(spark) // strategy only — perGroup never installs the rewrite
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
