package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling summary (the ANALYZE/data-quality pass of a pipeline):
  * per-column null count, distinct count, and min/max rendered as strings
  * so heterogeneous column types share one output schema.
  *
  * Everything is computed in ONE aggregation pass over the input — a
  * per-column loop of separate jobs would scan the corpus once per column;
  * this shape scans it once total and unpivots the single result row.
  * `count(DISTINCT)` per column is the exact (oracle-checkable) form; at
  * corpus scale swap `exact = false` to profile with HLL++ registers
  * instead of full distinct-key shuffles.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single summary row: stack(n, name1, nn1, nd1, mn1, mx1, ...)
    // label literal escaped and generated identifiers backtick-quoted, so a
    // column named "order date" or "o'clock" cannot break the parse
    def lbl(c: String) = "'" + c.replace("'", "''") + "'"
    def id(p: String, c: String) = s"`${(p + c).replace("`", "``")}`"
    val stackArgs = cols.map(c =>
      s"${lbl(c)}, ${id("__nn_", c)}, ${id("__nd_", c)}, ${id("__mn_", c)}, ${id("__mx_", c)}")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_str, max_str)")
  }
}
