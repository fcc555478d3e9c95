package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(rows: Seq[(Long, Long)]) =
    rows.toDF("event_id", "sec")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"))

  private def ivDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("win_id", "s", "e")
      .select(col("win_id"), timestamp_seconds(col("s")).as("w_start"),
        timestamp_seconds(col("e")).as("w_end"))

  test("bucketized matches the naive range join incl. boundaries and overlaps") {
    // probes at exact start/end bounds, inside overlap of two windows,
    // outside everything; windows shorter than, equal to, and spanning
    // multiple buckets (bucketWidth = 10)
    val probes = tsDf(Seq((1L, 100L), (2L, 110L), (3L, 115L), (4L, 131L),
      (5L, 99L), (6L, 140L), (7L, 125L)))
    val wins = ivDf(Seq(
      (10L, 100L, 110L), // spans buckets 10-11
      (11L, 108L, 125L), // overlaps win 10
      (12L, 131L, 131L), // degenerate single-second window
      (13L, 200L, 260L)))// matches nothing
    val got = RangeJoin.bucketized(probes, "ts", wins, "w_start", "w_end", 10L)
      .select("event_id", "win_id").as[(Long, Long)].collect().toSet
    val naive = probes.crossJoin(wins)
      .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "win_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (7L, 11L), (4L, 12L)))
  }

  test("bucketized plans as an equi-join, not a nested loop") {
    val probes = tsDf((1L to 50L).map(i => (i, 1000L + i * 7)))
    val wins = ivDf((1L to 20L).map(i => (i, 1000L + i * 13, 1040L + i * 13)))
    val plan = RangeJoin.bucketized(probes, "ts", wins, "w_start", "w_end", 30L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
