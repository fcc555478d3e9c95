package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    // key, attr, valid_from, valid_to, is_current
    (1L, "a", 0L, Option.empty[Long], true),   // will change
    (2L, "b", 0L, Option.empty[Long], true),   // no-op update
    (3L, "c", 0L, Option.empty[Long], true),   // untouched
    (4L, "x", 0L, Option(5L), false),          // closed history row
    (4L, "y", 5L, Option.empty[Long], true)    // current after history
  ).toDF("k", "attr", "valid_from", "valid_to", "is_current")

  test("scd2Merge: pass-through, close+open, no-op, brand-new key") {
    val updates = Seq(
      (1L, "a2", 10L), // changed → close old, open new
      (2L, "b", 10L),  // identical attrs → no-op
      (9L, "z", 10L)   // brand-new key
    ).toDF("k", "attr", "eff")
    val got = Scd.scd2Merge(dim, updates, Seq("k"), Seq("attr"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "a", 0L, Some(10L), false),  // closed
      (1L, "a2", 10L, None, true),      // opened
      (2L, "b", 0L, None, true),        // no-op pass-through
      (3L, "c", 0L, None, true),        // untouched
      (4L, "x", 0L, Some(5L), false),   // history passes through unjoined
      (4L, "y", 5L, None, true),        // current, no update
      (9L, "z", 10L, None, true)))      // inserted
  }

  test("scd2Merge: null attrs compare null-safely") {
    val d = Seq((1L, Option.empty[String], 0L, Option.empty[Long], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    // NULL → NULL is a no-op; NULL → value is a change
    val noop = Scd.scd2Merge(d,
      Seq((1L, Option.empty[String], 7L)).toDF("k", "attr", "eff"),
      Seq("k"), Seq("attr"))
    assert(noop.count() == 1 && noop.filter(col("is_current")).count() == 1)
    val chg = Scd.scd2Merge(d,
      Seq((1L, Option("v"), 7L)).toDF("k", "attr", "eff"),
      Seq("k"), Seq("attr"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(chg == Set(
      (1L, None, 0L, Some(7L), false),
      (1L, Some("v"), 7L, None, true)))
  }

  test("scd2FromChangeLog: run compression, intervals, tie ordering") {
    val log = Seq(
      // user 1: a a b a → runs a@10, b@30, a@40
      (1L, "a", 10L, 101L), (1L, "a", 20L, 102L),
      (1L, "b", 30L, 103L), (1L, "a", 40L, 104L),
      // user 2: single row → one current run
      (2L, "z", 10L, 201L),
      // user 3: ts tie broken by the id column — id 302 ("q") sorts
      // after id 301 ("p"), so p heads and q is the current run
      (3L, "q", 10L, 302L), (3L, "p", 10L, 301L)
    ).toDF("k", "attr", "ts", "id")
    val got = Scd.scd2FromChangeLog(log, Seq("k"), Seq("attr"), "ts",
        tieCols = Seq("id"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "z", 10L, None, true),
      (3L, "p", 10L, Some(10L), false),
      (3L, "q", 10L, None, true)))
  }

  test("scd2Merge result feeds the next merge (incremental composition)") {
    val updates1 = Seq((1L, "a2", 10L)).toDF("k", "attr", "eff")
    val v1 = Scd.scd2Merge(dim, updates1, Seq("k"), Seq("attr"))
    val updates2 = Seq((1L, "a3", 20L)).toDF("k", "attr", "eff")
    val v2 = Scd.scd2Merge(v1, updates2, Seq("k"), Seq("attr"))
    val hist1 = v2.filter(col("k") === 1).orderBy(col("valid_from"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(hist1 == Seq(
      (1L, "a", 0L, Some(10L), false),
      (1L, "a2", 10L, Some(20L), false),
      (1L, "a3", 20L, None, true)))
  }
}
