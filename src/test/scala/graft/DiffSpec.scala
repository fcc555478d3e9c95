package graft

import graft.ops.Diff

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed; unchanged filtered by default") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val nw = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "t")
    val got = Diff.snapshotDiff(old, nw, Seq("id"), Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val all = Diff.snapshotDiff(old, nw, Seq("id"), Seq("t"),
      includeUnchanged = true).as[(Long, String)].collect().toMap
    assert(all(2L) == "unchanged" && all.size == 4)
  }

  test("snapshotDiff: null content rows classify via null-safe compare, multi-col keys work") {
    val old = Seq((1L, "x", Option("v")), (1L, "y", None), (2L, "x", Option("w")))
      .toDF("id", "part", "t")
    val nw = Seq((1L, "x", Option("v")), (1L, "y", Option("now")), (2L, "x", None))
      .toDF("id", "part", "t")
    val got = Diff.snapshotDiff(old, nw, Seq("id", "part"), Seq("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    // xxhash64(null) is the seed (non-null), so null→value and value→null
    // both surface as changed, not dropped
    assert(got == Map((1L, "y") -> "changed", (2L, "x") -> "changed"))
  }

  test("snapshotDiff: a hashFn returning NULL (md5 of null text) still classifies correctly") {
    // existence comes from the per-side marker, not hash nullness — the
    // review-caught failure mode was NULL-hash rows misreported as
    // added/removed
    import org.apache.spark.sql.functions.md5
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("id", "t")
    val nw = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("id", "t")
    val got = Diff.snapshotDiff(old, nw, Seq("id"), Seq("t"),
      hashFn = cols => md5(cols.head), includeUnchanged = true)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed",   // null → value, not "added"
      2L -> "unchanged",                 // null hash on both sides
      3L -> "unchanged"))
  }

  test("distributionDrift: identical snapshots drift zero, one-sided categories stay finite") {
    val v1 = Seq("a", "a", "a", "b").toDF("c")
    // identical distributions → every js_term is exactly 0
    val same = Diff.distributionDrift(v1, v1, "c")
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(same == Map("a" -> 0.0, "b" -> 0.0))
    // category 'b' vanishes, 'c' appears: both one-sided terms are finite
    // (JS, not KL) and total JSD stays within the ln 2 bound
    val v2 = Seq("a", "a", "c", "c").toDF("c")
    val drift = Diff.distributionDrift(v1, v2, "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(drift("b")._1 == 1L && drift("b")._2 == 0L)
    assert(drift("c")._1 == 0L && drift("c")._2 == 2L)
    assert(drift.values.forall(t => !t._3.isNaN && !t._3.isInfinite))
    val jsd = drift.values.map(_._3).sum
    assert(jsd > 0.0 && jsd <= math.log(2.0) + 1e-9, s"jsd=$jsd")
    // hand-check one term: category 'a' has p=0.75, q=0.5, m=0.625
    val expectedA = 0.5 * 0.75 * math.log(0.75 / 0.625) +
      0.5 * 0.5 * math.log(0.5 / 0.625)
    assert(math.abs(drift("a")._3 - expectedA) < 1e-6)
  }
}
