package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("attaches most recent strictly-prior right payload per key") {
    val quotes = Seq( // key, time, price
      (1L, ts(10), 100.0), (1L, ts(20), 110.0), (1L, ts(30), 120.0),
      (2L, ts(15), 55.0)
    ).toDF("id", "t", "price")
    val trades = Seq( // key, time
      (1L, ts(5)), (1L, ts(20)), (1L, ts(25)), (1L, ts(35)),
      (2L, ts(15)), (2L, ts(16)), (3L, ts(50))
    ).toDF("id", "t")
    val out = AsOfJoin(trades, quotes, Seq("id"), "t", "price", "last_price")
      .select("id", "t", "last_price")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, 5L, None), // nothing prior
      (1L, 20L, Some(100.0)), // STRICT: the t=20 quote is not visible at t=20
      (1L, 25L, Some(110.0)),
      (1L, 35L, Some(120.0)),
      (2L, 15L, None), // strict again
      (2L, 16L, Some(55.0)),
      (3L, 50L, None))) // key with no right rows
  }

  test("rejects output-column collisions") {
    val df = Seq((1L, ts(1), 1.0)).toDF("id", "t", "v")
    assertThrows[IllegalArgumentException](
      AsOfJoin(df, df, Seq("id"), "t", "v", "v"))
  }

  test("empty right side: all left rows survive with a null carry-forward") {
    val left = Seq((1L, ts(5), 1.0), (2L, ts(6), 2.0)).toDF("id", "t", "v")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("id", "t", "v")
    val out = AsOfJoin(left, right, Seq("id"), "t", "v", "last_v")
    assert(out.count() == 2)
    assert(out.filter(org.apache.spark.sql.functions.col("last_v").isNotNull).count() == 0)
  }
}
