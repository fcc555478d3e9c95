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

  test("property: bucketized equals naive for random intervals and widths") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val probes = tsDf((1L to 150L).map(i => (i, 500L + rnd.nextInt(1000))))
      val wins = ivDf((1L to 40L).map { i =>
        val s = 400L + rnd.nextInt(1100)
        (i, s, s + rnd.nextInt(200)) // width 0-199, overlapping freely
      })
      val naive = probes.crossJoin(wins)
        .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
        .select("event_id", "win_id").as[(Long, Long)].collect().toSet
      for (width <- Seq(7L, 64L, 1000L)) {
        val got = RangeJoin.bucketized(probes, "ts", wins, "w_start", "w_end", width)
          .select("event_id", "win_id").as[(Long, Long)].collect().toSet
        assert(got == naive, s"trial=$trial width=$width")
      }
    }
  }

  test("salting composes: salted bucket join returns the identical pair set") {
    // the scaladoc claims skew tooling composes with the bucket key — prove
    // it: replicate each interval across `salts` sub-keys, route each probe
    // to one deterministic sub-key, join on (bucket, salt); a hot bucket's
    // work then spreads over `salts` tasks with NO change in results
    val salts = 4
    val probes = tsDf((1L to 200L).map(i => (i, 1000L + i * 3)))
    val wins = ivDf((1L to 30L).map(i => (i, 950L + i * 11, 1000L + i * 11)))
    val expected = RangeJoin.bucketized(probes, "ts", wins, "w_start", "w_end", 50L)
      .select("event_id", "win_id").as[(Long, Long)].collect().toSet
    val p = probes.withColumn("__bucket", floor(col("ts").cast("long") / 50L))
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
    val iv = wins
      .withColumn("__bucket", explode(sequence(
        floor(col("w_start").cast("long") / 50L),
        floor(col("w_end").cast("long") / 50L))))
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    val salted = p.join(iv, Seq("__bucket", "__salt"))
      .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "win_id").as[(Long, Long)].collect().toSet
    assert(salted == expected)
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
