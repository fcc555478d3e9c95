package graft

import org.apache.spark.sql.functions._

import graft.ops.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gap days materialize zero-filled and flagged; present days aggregate") {
    // key "a": events on day 0 and day 3 → days 1, 2 filled; "b": one day
    val day = 86400L
    val df = Seq(
      ("a", 10L, 1.5), ("a", 20L, 2.5),          // day 0, two events
      ("a", 3 * day + 5, 4.0),                   // day 3
      ("b", 7 * day + 1, 9.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.dailyWithGaps(df, "k", "ts", "v")
      .orderBy("k", "day_epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("a", 0L, 4.0, 2L, false),
      ("a", day, 0.0, 0L, true),
      ("a", 2 * day, 0.0, 0L, true),
      ("a", 3 * day, 4.0, 1L, false),
      ("b", 7 * day, 9.0, 1L, false)))
  }

  test("ewmaSmooth: hand-computed fold, first day seeds, keys independent") {
    val day = 86400L
    val df = Seq(
      ("a", 0L, 10.0), ("a", 1L, 10.0),   // day 0 total 20
      ("a", day, 10.0),                    // day 1 total 10
      ("a", 2 * day, 40.0),                // day 2 total 40
      ("b", 5 * day, 7.0))                 // singleton series
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.ewmaSmooth(df, "k", "ts", "v", alpha = 0.3)
      .orderBy("k", "day_epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // s0 = 20; s1 = .3*10 + .7*20 = 17; s2 = .3*40 + .7*17 = 23.9
    assert(got.toSeq == Seq(
      ("a", 0L, 20.0, 20.0),
      ("a", day, 10.0, 17.0),
      ("a", 2 * day, 40.0, 23.9),
      ("b", 5 * day, 7.0, 7.0)))
  }

  test("ewmaSmooth property: matches the scalar reference fold on random series") {
    val day = 86400L
    val rnd = new scala.util.Random(7)
    val raw = for {
      k <- Seq("x", "y", "z"); d <- 0 until 40
      if rnd.nextDouble() < 0.8 // gaps: EWMA runs over PRESENT days only
    } yield (k, d * day + rnd.nextInt(86400), math.rint(rnd.nextDouble() * 1e6) / 100)
    val df = raw.toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.ewmaSmooth(df, "k", "ts", "v", alpha = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // scalar reference: same rounding discipline (4-decimal daily totals,
    // 6-decimal output), explicit left fold
    val expected = raw.groupBy { case (k, s, _) => (k, s / day) }
      .map { case ((k, d), vs) =>
        (k, d * day) -> math.rint(vs.map(_._3).sum * 1e4) / 1e4 }
      .groupBy(_._1._1)
      .flatMap { case (_, days) =>
        val ordered = days.toSeq.sortBy(_._1._2)
        ordered.zipWithIndex.scanLeft(Option.empty[((String, Long), Double)]) {
          case (prev, ((key, v), _)) =>
            Some(key -> (prev match {
              case None => v
              case Some((_, s)) => 0.3 * v + 0.7 * s
            }))
        }.flatten
      }
      .map { case (key, s) => key -> math.rint(s * 1e6) / 1e6 }
    assert(got == expected)
  }

  test("holtSmooth: hand-computed level/trend, singleton seeds trend 0") {
    val day = 86400L
    val df = Seq(
      ("a", 0L, 10.0),                     // day 0 total 10
      ("a", day, 20.0),                    // day 1 total 20
      ("a", 2 * day, 30.0),                // day 2 total 30
      ("b", 5 * day, 7.0))                 // singleton series
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.holtSmooth(df, "k", "ts", "v")
      .orderBy("k", "day_epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // α=.5 β=.25: l1=10 t1=0; l2=.5·20+.5·10=15, t2=.25·5+.75·0=1.25;
    // l3=.5·30+.5·16.25=23.125, t3=.25·8.125+.75·1.25=2.96875
    assert(got.toSeq == Seq(
      ("a", 0L, 10.0, 10.0, 0.0, 10.0),
      ("a", day, 20.0, 15.0, 1.25, 16.25),
      ("a", 2 * day, 30.0, 23.125, 2.96875, 26.09375),
      ("b", 5 * day, 7.0, 7.0, 0.0, 7.0)))
  }

  test("holtSmooth property: matches the scalar two-state fold") {
    val day = 86400L
    val rnd = new scala.util.Random(13)
    val raw = for {
      k <- Seq("x", "y"); d <- 0 until 30
      if rnd.nextDouble() < 0.8
    } yield (k, d * day + rnd.nextInt(86400), math.rint(rnd.nextDouble() * 1e6) / 100)
    val df = raw.toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.holtSmooth(df, "k", "ts", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val expected = raw.groupBy { case (k, s, _) => (k, s / day) }
      .map { case ((k, d), vs) =>
        (k, d * day) -> math.rint(vs.map(_._3).sum * 1e4) / 1e4 }
      .groupBy(_._1._1)
      .flatMap { case (_, days) =>
        val ordered = days.toSeq.sortBy(_._1._2)
        ordered.scanLeft(Option.empty[((String, Long), (Double, Double))]) {
          case (prev, (key, v)) =>
            Some(key -> (prev match {
              case None => (v, 0.0)
              case Some((_, (l, t))) =>
                val lvl = 0.5 * v + 0.5 * (l + t)
                (lvl, 0.25 * (lvl - l) + 0.75 * t)
            }))
        }.flatten
      }
      .map { case (key, (l, t)) =>
        key -> (math.rint(l * 1e6) / 1e6, math.rint(t * 1e6) / 1e6,
          math.rint((l + t) * 1e6) / 1e6) }
    assert(got == expected)
  }

  test("rollingDistinctUsers: window unions users, trailing days cut") {
    val day = 86400L
    // users 1,2 on day 0; user 3 on day 2; user 1 again on day 9
    val df = Seq(
      (0L, 1L), (10L, 2L), (20L, 1L),
      (2 * day, 3L),
      (9 * day, 1L))
      .toDF("sec", "u")
      .select(timestamp_seconds(col("sec")).as("ts"), col("u"))
    val got = Resample.rollingDistinctUsers(df, "ts", "u", windowDays = 7)
      .orderBy("day_epoch").collect()
      .map(r => (r.getLong(0) / day, r.getLong(1), r.getLong(2)))
    // day 0: {1,2}; day 2: {3} 1d, window [-4,2] = {1,2,3}; day 9: {1} 1d,
    // window [3,9] covers only day 9 → {1}
    assert(got.toSeq == Seq((0L, 2L, 2L), (2L, 1L, 3L), (9L, 1L, 1L)))
  }

  test("decayedPopularity: one-half-life-old events count half; " +
    "today's count full; freshness ratio exact") {
    // key g: 2 events today (age 0) + 4 events 7 days ago (age 7,
    // half-life 7): decayed = 2*1 + 4*0.5 = 4.0; freshness = 4/6
    val day = 86400L
    val rows = Seq.fill(4)(("g", 1L)) ++ Seq.fill(2)(("g", 7 * day + 1))
    val df = rows.toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val got = Resample.decayedPopularity(df, "k", "ts", halfLifeDays = 7.0)
      .as[(String, Long, Double, Double)].collect().head
    assert(got == (("g", 6L, 4.0, 0.666667)))
  }

  test("cusumAlarm: hand-computed integer recurrence fires after the shift") {
    // one $1 event/day for 3 days then $5/day: day stat = v·1e8 µ¢,
    // mu = 18e8 DIV 6 = 3e8, slack = 15e6, threshold = 1.5e8;
    // S = [0,0,0,1.85e8,3.7e8,5.55e8] -> alarms from the first shifted day
    val day = 86400L
    val df = (0 to 5).map(i =>
        ("g", i * day + 1, if (i < 3) 1.0 else 5.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val got = Resample.cusumAlarm(df, "k", "ts", "v")
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getInt(5)))
    assert(got.toSeq == Seq(
      (100000000L, 0L, 0), (100000000L, 0L, 0), (100000000L, 0L, 0),
      (500000000L, 185000000L, 1), (500000000L, 370000000L, 1),
      (500000000L, 555000000L, 1)))
  }
}
