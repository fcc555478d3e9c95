package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance — the lakehouse primitive
  * behind versioned metadata tables (document source registries, license
  * states, user attributes): every change to a keyed row is recorded as a
  * new version with a validity interval instead of an in-place overwrite,
  * so any historical snapshot can be reconstructed with a point-in-time
  * filter (`valid_from <= t AND (valid_to IS NULL OR t < valid_to)`).
  *
  * Two entry points:
  *   - [[scd2Merge]]: fold one batch of updates into an existing SCD2
  *     table (the incremental path a nightly ingest runs);
  *   - [[scd2FromChangeLog]]: compress a raw change/event log into SCD2
  *     intervals in one pass (the backfill path).
  *
  * Scale shape (merge): closed history rows never join — they pass through
  * on a filter, no shuffle. Only the current slice and the (typically much
  * smaller) update batch shuffle, on the dimension key: well-spread, no
  * skew amplification, AQE handles the rest. The three merge outcomes
  * (pass-through / close / open) are emitted in ONE pass over the joined
  * row via an array-of-structs + `inline` — not a 3-branch union that
  * would execute the join three times.
  */
object Scd {

  /** Merge `updates` (one row per key — the caller's dedup contract, same
    * as [[Diff.snapshotDiff]]'s keyed-table contract) into SCD2 table
    * `dim`.
    *
    * `dim` columns: `keyCols ++ attrCols ++ (fromCol, toCol, curCol)`;
    * rows with `curCol = true` must have `toCol` NULL (open interval).
    * `updates` columns: `keyCols ++ attrCols ++ effCol`, where `effCol`
    * (same type as `fromCol` — any ordered type; epoch longs here,
    * timestamps in production) stamps when the new version takes effect.
    *
    * Outcomes per key:
    *   - key absent from `updates`, or attrs unchanged (null-safe
    *     compare): current row passes through untouched;
    *   - attrs changed: current row is closed (`toCol = eff`,
    *     `curCol = false`) AND a new open row is emitted;
    *   - brand-new key: one new open row.
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame,
                keyCols: Seq[String], attrCols: Seq[String],
                effCol: String = "eff",
                fromCol: String = "valid_from", toCol: String = "valid_to",
                curCol: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val outCols = keyCols ++ attrCols ++ Seq(fromCol, toCol, curCol)
    val toType = dim.schema(toCol).dataType

    val hist = dim.filter(!col(curCol)).select(outCols.map(col): _*)
    val cur = dim.filter(col(curCol))
      .select(outCols.map(col) :+ lit(true).as("__cex"): _*)
    val upd = updates.select(
      keyCols.map(col) ++ attrCols.map(a => col(a).as(s"__u_$a")) ++
        Seq(col(effCol).as("__eff"), lit(true).as("__uex")): _*)

    // full-outer on the key (using-columns => coalesced key output)
    val j = cur.join(upd, keyCols, "full_outer")
    val attrsEqual = attrCols.map(a => col(a) <=> col(s"__u_$a"))
      .reduce(_ && _)

    def asStruct(attrs: Seq[Column], from: Column, to: Column,
                 current: Column): Column =
      struct(attrCols.zip(attrs).map { case (a, c) => c.as(a) } ++
        Seq(from.as(fromCol), to.as(toCol), current.as(curCol)): _*)

    // a current row's toCol is NULL by contract, so the pass-through
    // struct can reuse it directly; new rows cast an explicit NULL
    val keep = asStruct(attrCols.map(col), col(fromCol), col(toCol),
      lit(true))
    val closed = asStruct(attrCols.map(col), col(fromCol), col("__eff"),
      lit(false))
    val opened = asStruct(attrCols.map(a => col(s"__u_$a")), col("__eff"),
      lit(null).cast(toType), lit(true))

    val versions = when(col("__uex").isNull, array(keep))
      .when(col("__cex").isNull, array(opened))
      .when(attrsEqual, array(keep))
      .otherwise(array(closed, opened))

    val merged = j.select(keyCols.map(col) :+ inline(versions): _*)
      .select(outCols.map(col): _*)
    hist.unionByName(merged)
  }

  /** Compress a change log (one row per observed state, possibly with
    * consecutive repeats) into SCD2 intervals: per key, order by
    * `(tsCol, tieCols*)`, keep only rows where the attribute tuple
    * differs from the previous row (run heads), then `valid_from = ts`,
    * `valid_to = next run head's ts`, `is_current` on the last run.
    *
    * Scale shape: one shuffle on the key; both windows share the same
    * partitioning + ordering so Catalyst reuses a single sort-exchange.
    * Per-key state is a sort — no driver traffic, no iteration.
    *
    * `tieCols` must make the ordering total (a duplicate-timestamp tie
    * that orders differently across engines/retries would flip which row
    * heads a run).
    */
  def scd2FromChangeLog(changes: DataFrame, keyCols: Seq[String],
                        attrCols: Seq[String], tsCol: String,
                        tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val ord = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val changed = attrCols.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val heads = changes
      .withColumn("__head", row_number().over(w) === 1 || changed)
      .filter(col("__head"))
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    heads
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
