package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: aggregate an event stream to a fixed daily
  * grain and materialize the missing days (gap filling) — the step between
  * raw event logs and anything that assumes a dense time axis (training
  * curves, rate-of-change windows, seasonal decomposition; a RANGE frame
  * like q83 shrinks over gaps, a ROWS frame over a FILLED grid does not).
  */
object Resample {

  /** Daily totals per key over each key's [min day, max day] span, absent
    * days filled with zeros and flagged.
    *
    * Scale shape: the grid derives from a per-key (min, max) aggregate of
    * the already-reduced daily table and explodes to one row per day —
    * grid size is keys × span-days, independent of raw event volume — and
    * the fill join is a (key, day) equi-join between two aggregates that
    * share partitioning. The raw stream is scanned once.
    */
  def dailyWithGaps(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("__day"))
      .agg(sum(col(valueCol)).as("__total"), count(lit(1)).as("__n"))
    val grid = daily
      .groupBy(col(keyCol))
      .agg(min(col("__day")).as("__mn"), max(col("__day")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr("INTERVAL 1 DAY")))
          .as("__day"))
    grid.join(daily, Seq(keyCol, "__day"), "left")
      .select(col(keyCol),
        unix_timestamp(col("__day")).as("day_epoch"),
        round(coalesce(col("__total"), lit(0.0)), 4).as("day_total"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        col("__total").isNull.as("filled"))
  }

  /** Exponentially-weighted moving average per key over the daily series:
    * s_1 = x_1, s_t = α·x_t + (1−α)·s_{t−1} — the classic smoother for
    * training-curve/rate dashboards, and the representative of the whole
    * "sequential stateful fold" operator family (EWMA has no closed
    * windowed form a plain aggregate can express).
    *
    * Scale shape: the raw stream is reduced to the per-(key, day) grain
    * FIRST (map-side-combinable sum — this is the only pass over event
    * volume), then each key's bounded daily series (span-days ≤ a few
    * thousand for years of data) is collected per key and folded
    * left-to-right with a single `aggregate()` higher-order function —
    * per-key state is one array that never leaves its executor, no
    * driver collection, no cross-key traffic beyond the daily rollup's
    * own shuffle. A per-key ORDER BY window would sort the same rows;
    * the fold makes the sequential dependence explicit and keeps the
    * whole smoother inside one projection.
    *
    * Portability: daily totals are rounded to 4 decimals BEFORE the fold
    * so both engines fold bit-identical inputs through the identical
    * α·x + (1−α)·s operation sequence (left-to-right, so the result is
    * deterministic and engine-independent); the smoothed value is
    * rounded to 6 on output.
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, alpha: Double = 0.3): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("__day"))
      .agg(round(sum(col(valueCol)), 4).as("__v"))
    val series = daily
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__day"), col("__v"))))
        .as("__ser"))
    // running-EWMA array: append α·x + (1−α)·last(acc) per element; the
    // `when` guard makes the first element its own seed (CASE branches
    // are lazily evaluated in codegen, so element_at(acc, -1) never runs
    // on the empty accumulator under ANSI mode)
    val ew = aggregate(
      transform(col("__ser"), s => s.getField("__v")),
      array().cast("array<double>"),
      (acc, x) => concat(acc, array(
        when(size(acc) === 0, x)
          .otherwise(lit(alpha) * x + lit(1 - alpha) * element_at(acc, -1)))))
    series.withColumn("__ew", ew)
      .select(col(keyCol), posexplode(col("__ser")).as(Seq("__i", "__s")),
        col("__ew"))
      .select(col(keyCol),
        unix_timestamp(col("__s.__day")).as("day_epoch"),
        col("__s.__v").as("day_total"),
        round(element_at(col("__ew"), col("__i") + 1), 6).as("ewma"))
  }
}
