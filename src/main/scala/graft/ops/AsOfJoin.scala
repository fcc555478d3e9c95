package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the payload of the most recent
  * STRICTLY-prior right row with the same key.
  *
  * Spark has no native as-of join; the naive formulation is a range join
  * (O(|L|·|R|) per key) or a per-key collect. This composition (SURVEY.md
  * §4 preference tier a — compose built-ins before custom plans) is:
  *
  *   union(left tagged 1, right tagged 0)
  *   → window over (key ORDER BY time, side DESC) carrying the last right
  *     payload via last(..., ignoreNulls) over rows (-∞, -1)
  *   → keep left rows
  *
  * ONE shuffle + sort on (key, time) total, linear in |L|+|R| — the shape
  * that survives 100 TB. Ordering (time asc, side desc) puts a left row
  * before a right row with the identical timestamp, so an equal-time right
  * row is NOT visible to it: strict `right.time < left.time` semantics,
  * matching ASOF JOIN ON l.t > r.t.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keyCols: Seq[String],
            timeCol: String, payloadCol: String, outCol: String): DataFrame = {
    require(!left.columns.contains(outCol),
      s"output column $outCol already exists on the left side")
    val payloadType = right.schema(payloadCol).dataType
    val r = right.select(
      (keyCols.map(col) :+ col(timeCol) :+ col(payloadCol).as("__asof_payload")): _*)
      .withColumn("__asof_side", lit(0))
    val l = left
      .withColumn("__asof_payload", lit(null).cast(payloadType))
      .withColumn("__asof_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__asof_side").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.withColumn(outCol,
        last(when(col("__asof_side") === 0, col("__asof_payload")), ignoreNulls = true)
          .over(w))
      .filter(col("__asof_side") === 1)
      .drop("__asof_side", "__asof_payload")
  }
}
