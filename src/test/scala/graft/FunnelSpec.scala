package graft

import graft.ops.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("funnelDepths: ordering, strict-after, and tie rules") {
    val ev = Seq(
      // user 1: full funnel in order → 3
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
      // user 2: click BEFORE the first view only → 1
      (4L, 2L, 5L, "click"), (5L, 2L, 10L, "view"),
      // user 3: view then click, no purchase → 2
      (6L, 3L, 10L, "view"), (7L, 3L, 11L, "click"),
      // user 4: purchase without a view → 0
      (8L, 4L, 10L, "purchase"),
      // user 5: view/click at the SAME ts, click has the larger id →
      // strictly-after holds via the id tiebreak → 2
      (9L, 5L, 10L, "view"), (10L, 5L, 10L, "click"),
      // user 6: same ts but click id SMALLER than view id → not after → 1
      (12L, 6L, 10L, "view"), (11L, 6L, 10L, "click"),
      // user 7: two views; the FIRST is the frontier, so a click between
      // them still qualifies → 2
      (13L, 7L, 10L, "view"), (15L, 7L, 30L, "view"), (14L, 7L, 20L, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.funnelDepths(ev, steps)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 2,
      6L -> 1, 7L -> 2))
  }

  test("frequentPaths: ordered n-grams per user, count-desc path-tiebreak ranking") {
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "c"), // a>b>c
      (4L, 2L, 10L, "a"), (5L, 2L, 20L, "b"), (6L, 2L, 30L, "c"), // a>b>c
      (7L, 3L, 10L, "b"), (8L, 3L, 20L, "c"), (9L, 3L, 30L, "a"), // b>c>a
      (10L, 4L, 10L, "x"), (11L, 4L, 20L, "y")                     // too short
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Funnel.frequentPaths(ev, n = 3, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b > c", 2L), ("b > c > a", 1L)))
  }

  test("frequentPaths: same-ts events order by event_id inside the sequence") {
    val ev = Seq(
      (2L, 1L, 10L, "b"), (1L, 1L, 10L, "a"), (3L, 1L, 10L, "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Funnel.frequentPaths(ev, n = 3, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b > c", 1L)))
  }

  test("cohortRetention: first-week cohorts, week offsets, one count per user-week") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // weeks: Mon 2024-01-01, Mon 2024-01-08, Mon 2024-01-15
    val ev = Seq(
      (1L, ts(2)), (1L, ts(3)),   // user 1 cohort w0, active w0 (twice → once)
      (1L, ts(9)),                // user 1 active w1
      (2L, ts(10)),               // user 2 cohort w1
      (2L, ts(16))                // user 2 active w2 (offset 1)
    ).toDF("user_id", "ts")
    val w0 = java.time.LocalDate.parse("2024-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val w1 = w0 + 7 * 86400
    val got = graft.ops.Funnel.cohortRetention(ev)
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((w0, 0) -> 1L, (w0, 1) -> 1L, (w1, 0) -> 1L, (w1, 1) -> 1L))
  }

  test("funnelDepths conversion window: late steps expire relative to the FIRST step") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      // user 1: view@1h, click@2h, purchase@3h — all inside 4 hours → 3
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"), (3L, 1L, ts(3), "purchase"),
      // user 2: click 5h after the view → outside the window → 1
      (4L, 2L, ts(1), "view"), (5L, 2L, ts(6), "click"),
      // user 3: click inside, purchase 6h after the VIEW (not the click!)
      // → window anchors on step 1 → 2
      (6L, 3L, ts(1), "view"), (7L, 3L, ts(4), "click"), (8L, 3L, ts(7), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.funnelDepths(ev, steps,
      withinOfFirst = Some("4 HOURS")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2))
    // without the window, users 2 and 3 complete further
    val open = Funnel.funnelDepths(ev, steps).as[(Long, Int)].collect().toMap
    assert(open == Map(1L -> 3, 2L -> 2, 3L -> 3))
  }

  test("funnelCounts sums depths; every user appears exactly once") {
    val ev = Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"),
      (3L, 2L, 10L, "view"),
      (4L, 3L, 10L, "error")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.funnelCounts(ev, steps)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(2 -> 1L, 1 -> 1L, 0 -> 1L))
  }

  test("sessionFunnelCounts: a step chain cannot cross the inactivity gap") {
    import org.apache.spark.sql.functions._
    val ev = Seq(
      // user 1: view→click→purchase inside one session → depth 3
      (1L, 1L, 0L, "view"), (2L, 1L, 60L, "click"), (3L, 1L, 120L, "purchase"),
      // user 2: view, then a >30-min gap, then click+purchase — the
      // second session has no view, so its chain never starts:
      // session A depth 1, session B depth 0
      (4L, 2L, 0L, "view"), (5L, 2L, 3600L, "click"), (6L, 2L, 3700L, "purchase")
    ).toDF("event_id", "user_id", "secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .drop("secs")
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Funnel.sessionFunnelCounts(ev, steps)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(3 -> 1L, 1 -> 1L, 0 -> 1L), s"got $got")
    // the plain funnel WOULD chain across the gap: user 2 reaches 3
    val plain = Funnel.funnelCounts(ev, steps).as[(Int, Long)].collect().toMap
    assert(plain == Map(3 -> 2L), s"got $plain")
  }

  test("frequentSessionPaths: a path cannot span the inactivity gap") {
    import org.apache.spark.sql.functions._
    // one user, two sessions split by a >30-min gap: the only 3-grams
    // are the within-session ones; the cross-gap grams (b>c>d, c>d>e)
    // that plain frequentPaths WOULD mine must not appear
    val ev = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 60L, "b"), (3L, 1L, 120L, "c"),
      (4L, 1L, 3600L, "d"), (5L, 1L, 3660L, "e"), (6L, 1L, 3720L, "f")
    ).toDF("event_id", "user_id", "secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .drop("secs")
    val sessioned = Funnel.frequentSessionPaths(ev, n = 3, k = 10)
      .as[(String, Long)].collect().toMap
    assert(sessioned == Map("a > b > c" -> 1L, "d > e > f" -> 1L),
      s"got $sessioned")
    val plain = Funnel.frequentPaths(ev, n = 3, k = 10)
      .as[(String, Long)].collect().toMap
    assert(plain.keySet == Set("a > b > c", "b > c > d", "c > d > e",
      "d > e > f"), s"got $plain")
  }

  test("conversionLatencies: first-touch anchor to chosen last step, completers only") {
    import org.apache.spark.sql.functions._
    // user 1: view@10, click@20, purchase@50 → latency 40s; a LATER
    // view@15 must not move the anchor (first-touch), and an EARLIER
    // purchase@5 must not count (strict-after). user 2 never clicks.
    val ev = Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 15L, "view"),
      (3L, 1L, 20L, "click"), (4L, 1L, 5L, "purchase"),
      (5L, 1L, 50L, "purchase"),
      (6L, 2L, 10L, "view"), (7L, 2L, 50L, "purchase")
    ).toDF("event_id", "user_id", "secs", "event_type")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .drop("secs")
    val got = Funnel.conversionLatencies(ev, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10000000L, 50000000L, 40000000L)), s"got $got")
  }

  test("lastTouchAttribution: strictly-preceding touch, carry across " +
    "later non-touch events, unattributed bucket") {
    import org.apache.spark.sql.functions.{col, expr, timestamp_seconds}
    val ev = Seq(
      // user 1: view(ch 2) -> click -> purchase 3.00 -> view(ch 4) ->
      // purchase 5.00: first purchase credits ch 2, second ch 4
      (1L, 1L, 10L, "view", 0.0, 25L), (2L, 1L, 20L, "click", 0.0, 99L),
      (3L, 1L, 30L, "purchase", 3.0, 0L), (4L, 1L, 40L, "view", 0.0, 41L),
      (5L, 1L, 50L, "purchase", 5.0, 0L),
      // user 2: purchase with NO prior view -> channel -1
      (6L, 2L, 10L, "purchase", 7.0, 0L),
      // user 3: view at the SAME ts as the purchase but larger id ->
      // not strictly preceding -> -1
      (8L, 3L, 10L, "purchase", 1.0, 0L), (9L, 3L, 10L, "view", 0.0, 33L)
    ).toDF("event_id", "user_id", "sec", "event_type", "value", "k")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"),
        col("value"), col("k"))
    val got = Funnel.lastTouchAttribution(ev, "view", "purchase",
        expr("k DIV 10"))
      .as[(Long, Long, Long)].collect()
      .map { case (c, n, cents) => c -> ((n, cents)) }.toMap
    assert(got == Map(2L -> ((1L, 300L)), 4L -> ((1L, 500L)),
      -1L -> ((2L, 800L))))
  }

  test("lastTouchAttribution: q259's floor-div bucketing agrees with " +
    "SQL // on NEGATIVE channels (DIV truncates, // floors)") {
    import org.apache.spark.sql.functions.{col, expr, timestamp_seconds}
    // k = -5: floor(-5/10) = -1; bare DIV 10 would emit 0 and silently
    // collide with the k∈[0,9] bucket. The q259 call site uses the
    // pmod floor-div form — replicated here against a negative fixture.
    val ev = Seq(
      (1L, 1L, 10L, "view", 0.0, -5L), (2L, 1L, 20L, "purchase", 2.0, 0L),
      (3L, 2L, 10L, "view", 0.0, 5L), (4L, 2L, 20L, "purchase", 1.0, 0L)
    ).toDF("event_id", "user_id", "sec", "event_type", "value", "k")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"),
        col("value"), col("k"))
    val got = Funnel.lastTouchAttribution(ev, "view", "purchase",
        expr("(k - pmod(k, 10)) DIV 10"))
      .as[(Long, Long, Long)].collect()
      .map { case (c, n, cents) => c -> ((n, cents)) }.toMap
    assert(got == Map(-1L -> ((1L, 200L)), 0L -> ((1L, 100L))))
  }
}
