package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event log (north-star extension;
  * SURVEY.md §2.11) — the classic product-analytics primitive: how far
  * each user progresses through an ordered step sequence (view → click →
  * purchase), where step i counts only if one of its events occurs
  * STRICTLY AFTER the chosen step-(i−1) event. "Chosen" is the earliest
  * qualifying event by (ts, id) — the first-touch rule, with the id
  * breaking timestamp ties deterministically.
  *
  * Scale shape: one pass per step — each pass filters the log to that
  * step's type (predicate pushed to the scan), equi-joins the narrow
  * per-user frontier of the previous step, and min-aggregates
  * (partial-aggregated; a hot user's events collapse map-side). Frontiers
  * are one row per surviving user and localCheckpoint so the k-step chain
  * doesn't re-derive prefix frontiers per consumer; the caller's
  * consume-then-release hygiene applies. Nothing event-volume-sized ever
  * leaves the executors.
  */
object Funnel {

  /** Per-user funnel depth: 0 ≤ depth ≤ steps.size, the number of steps
    * completed in order. Returns (userCol, depth) with one row per
    * distinct user in the log.
    */
  def funnelDepths(events: DataFrame, steps: Seq[String],
                   userCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id",
                   typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val after: (Column, Column, Column, Column) => Column =
      (ts, id, fts, fid) => ts > fts || (ts === fts && id > fid)
    var frontier: DataFrame = null
    val frontiers = steps.map { step =>
      val cand = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ets"), col(idCol).as("__eid"))
      val qualified =
        if (frontier == null) cand
        else cand.join(frontier, Seq(userCol))
          .filter(after(col("__ets"), col("__eid"),
            col("__fts"), col("__fid")))
          .select(col(userCol), col("__ets"), col("__eid"))
      frontier = qualified.groupBy(userCol)
        .agg(min(struct(col("__ets"), col("__eid"))).as("__m"))
        .select(col(userCol), col("__m.__ets").as("__fts"),
          col("__m.__eid").as("__fid"))
        .localCheckpoint()
      frontier
    }
    val users = events.select(col(userCol)).distinct()
    val joined = frontiers.zipWithIndex.foldLeft(users) {
      case (acc, (f, i)) =>
        acc.join(f.select(col(userCol), lit(1).as(s"__s$i")),
          Seq(userCol), "left")
    }
    // fold from step 0 outward so the DEEPEST completed step is the
    // outermost `when` and wins
    val depth = steps.indices.foldLeft(lit(0)) {
      (acc, i) => when(col(s"__s$i") === 1, lit(i + 1)).otherwise(acc)
    }
    joined.select(col(userCol), depth.as("depth"))
  }

  /** Funnel summary: users per depth level (0..steps.size). */
  def funnelCounts(events: DataFrame, steps: Seq[String],
                   userCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id",
                   typeCol: String = "event_type"): DataFrame =
    funnelDepths(events, steps, userCol, tsCol, idCol, typeCol)
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
}
