package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi key.
  *
  * Spark plans a pure `ts BETWEEN start AND end` join as a
  * BroadcastNestedLoopJoin — fine while the interval side fits a
  * broadcast, quadratic death once it doesn't. `bucketized` rewrites the
  * range predicate as an equi-join on coarse buckets of the time axis:
  * each interval explodes to every bucket it covers, each probe row maps
  * to exactly one bucket, the bucket equi-join prunes candidates to
  * near-misses, and the exact BETWEEN filter finishes. Because a probe
  * carries a single bucket, a (probe, interval) pair can meet at most
  * once — no post-join dedup.
  *
  * Scale shape: candidate volume is rows-per-bucket × (interval width /
  * bucketWidth + 1), independent of |probe| × |intervals|; both sides
  * shuffle on the bucket key, so skew tooling (salting) composes if one
  * time bucket runs hot. Pick bucketWidth near the median interval width:
  * wider buckets explode fewer interval copies but admit more false
  * candidates.
  */
object RangeJoin {

  /** `probe` rows whose `tsCol` (timestamp) falls inside
    * [`startCol`, `endCol`] (timestamps, inclusive) of any `intervals`
    * row. `bucketWidth` is in seconds.
    */
  def bucketized(probe: DataFrame, tsCol: String, intervals: DataFrame,
                 startCol: String, endCol: String,
                 bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = probe.withColumn("__bucket",
      floor(col(tsCol).cast("long") / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth),
        floor(col(endCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
