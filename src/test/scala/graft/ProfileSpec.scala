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

  test("profile is a single aggregation: exactly one scan of the input") {
    val prof = Profile.profile(Tables.orders(spark, sf0001),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    val scans = prof.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(prof.count() == 3)
  }
}
