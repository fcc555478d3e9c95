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

  /** Skew DIAGNOSTIC: the report an operator reads before reaching for
    * the defenses above (salting, caps, AQE skew hints) — the `topK`
    * hottest keys with exact frequency, corpus share (ppm, integer DIV),
    * and the skew ratio vs the mean key (×100, integer DIV; 100 = a
    * perfectly uniform key, 10 000 = this key carries 100 keys' worth of
    * rows). `salt_buckets` is the ready-to-use knob: the ceiling of the
    * ratio, i.e. how many uniform keys' worth of rows the hot key must
    * shard into for the shuffle to flatten.
    *
    * Scale shape: one partial-aggregated per-key count (hot keys collapse
    * map-side), a broadcast 1-row totals frame, and a global top-k that
    * plans as TakeOrderedAndProject — nothing key-cardinality-sized ever
    * sorts globally or reaches the driver.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    // mean key height reduces FIRST (floor, min 1) so every later product
    // stays ≤ 1e6·n_rows — n_rows·__nkeys would overflow int64 at
    // trillion-row × billion-key scale
    val totals = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__nkeys"))
      .select(col("__total"),
        expr("greatest(__total DIV __nkeys, 1)").as("__mean"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n_rows"),
        expr("1000000 * n_rows DIV __total").as("share_ppm"),
        expr("100 * n_rows DIV __mean").as("skew_x100"),
        expr("(n_rows + __mean - 1) DIV __mean").as("salt_buckets"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }
}
