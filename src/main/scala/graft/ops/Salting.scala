package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 / 100 TB posture).
  *
  * Plain algebraic aggregates (sum/count/min/max/avg) are already
  * skew-tolerant in Spark: map-side partial aggregation collapses hot keys
  * before the shuffle. The patterns here cover what partial aggregation
  * does NOT fix; AQE's skew-join splitting covers the join side.
  */
object Salting {

  /** Skew-safe per-key distinct count. `countDistinct` shuffles every
    * (key, value) occurrence to the key's single reducer — a hot key
    * serializes. Phase 1 dedups on (key, value) — partial aggregation
    * collapses duplicates map-side, and the shuffle key (key, value) is
    * uniform even when `key` alone is not; phase 2 counts per key.
    *
    * NULL handling matches `count(DISTINCT value)` exactly: `count(value)`
    * after the distinct skips NULLs without dropping the GROUP — a key
    * whose values are all NULL still appears with count 0 (a pre-distinct
    * NULL filter would make the group vanish instead).
    */
  def skewSafeDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
                            outCol: String = "n_distinct"): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(outCol))

  /** Salted two-phase sum/count per key — for when map-side partial
    * aggregation is unavailable (e.g. immediately downstream of a wide
    * transform that already partitioned by a skewed key, or with partial
    * aggregation disabled). Shards each key across `saltBuckets` partial
    * aggregates, then combines; the first shuffle is uniform regardless of
    * the key distribution. Salt choice cannot affect the result.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn(
      "__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
