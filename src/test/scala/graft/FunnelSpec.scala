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
}
