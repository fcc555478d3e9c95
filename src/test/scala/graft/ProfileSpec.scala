package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass profile: nulls counted, distinct excludes null, min/max as strings") {
    val df = Seq(
      (Some(3L), Some("b")), (None, Some("a")), (Some(1L), None),
      (Some(3L), Some("a"))).toDF("num", "s")
    val got = Profile.profile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got("num") == ((1L, 2L, "1", "3")))
    assert(got("s") == ((1L, 2L, "a", "b")))
  }

  test("column names with spaces and quotes survive the generated unpivot") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("order date", "o'clock")
    val got = Profile.profile(df, Seq("order date", "o'clock"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("order date" -> 2L, "o'clock" -> 2L))
  }

  test("profileChecked: exact distinct counts, HLL gate green, rsd threaded") {
    val df = Seq(
      (Some(3L), Some("b")), (None, Some("a")), (Some(1L), None),
      (Some(3L), Some("a"))).toDF("num", "s")
    val got = Profile.profileChecked(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getBoolean(5)))).toMap
    // same values as the exact profile, plus a green sketch gate
    assert(got("num") == ((1L, 2L, "1", "3", true)))
    assert(got("s") == ((1L, 2L, "a", "b", true)))
    // a non-default rsd reaches the sketch (not just the gate tolerance):
    // at tiny cardinality HLL is exact for any precision, so the tightened
    // gate must still hold
    val tight = Profile.profileChecked(df, Seq("num", "s"), rsd = 0.01)
      .collect().map(_.getBoolean(5))
    assert(tight.forall(identity))
  }

  test("profileChecked on empty input keeps one row per column (profile parity)") {
    // n_nulls is NULL on empty input (sum over zero rows) — same as
    // profile() and the oracle's aggregate shape; n_distinct coalesces to 0
    val empty = Seq.empty[(Option[Long], Option[String])].toDF("num", "s")
    val rows = Profile.profileChecked(empty, Seq("num", "s")).collect()
    assert(rows.map(_.getString(0)).toSet == Set("num", "s"))
    rows.foreach { r =>
      assert(r.isNullAt(1))           // n_nulls: null, as profile() renders it
      assert(r.getLong(2) == 0L)      // n_distinct coalesced
      assert(r.getBoolean(5))         // gate trivially green at 0 ≤ max(1, ·)
    }
  }

  test("profile is a single aggregation: exactly one scan of the input") {
    val prof = Profile.profile(Tables.orders(spark, sf0001),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    val scans = prof.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(prof.count() == 3)
  }

  test("benfordAudit: all 9 digit rows, integer shares, Benford ppm " +
    "constants, non-positives excluded") {
    val df = Seq(1L, 19L, 200L, 2L, 35L, 9L, 0L, -7L).toDF("v")
    val got = Profile.benfordAudit(df, "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.keySet == (1L to 9L).toSet)
    // digits: 1->{1,19}, 2->{200,2}, 3->{35}, 9->{9}; 0 and -7 excluded
    assert(got(1L)._1 == 2L && got(2L)._1 == 2L &&
      got(3L)._1 == 1L && got(9L)._1 == 1L && got(5L)._1 == 0L)
    assert(got(1L)._2 == 333333L) // 2e6 DIV 6
    // the Benford expectations are fixed constants of the law
    assert((1L to 9L).map(got(_)._3) == Seq(301030L, 176091L, 124939L,
      96910L, 79181L, 66947L, 57992L, 51153L, 45757L))
  }
}
