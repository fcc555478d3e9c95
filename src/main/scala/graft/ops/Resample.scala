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
}
