package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001)
  private lazy val sf001 = "/root/testdata/sf0.01"

  test("sketch quantiles land inside the exact error band (sf0.01, per group)") {
    // the property the q70 gate enforces, asserted directly at the verify SF
    val checked = Quantiles.approxPercentilesChecked(
      Tables.events(spark, sf001), Seq("event_type"), "value", Seq(0.5, 0.9, 0.99))
    val bad = checked.filter(!col("p50_ok") || !col("p90_ok") || !col("p99_ok"))
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }

  test("approx plan carries NO exact percentile aggregate (bounded state only)") {
    // exact `percentile` buffers every group value; the sketch tier must
    // not — gate on the aggregate expression actually planned. (Both are
    // ObjectHashAggregate; the EXPRESSION is what distinguishes full-value
    // state from GK-summary state.)
    val approx = Quantiles.approxPercentiles(
      events, Seq("event_type"), "value", Seq(0.5, 0.9))
    val s = approx.queryExecution.executedPlan.toString
    assert(s.contains("percentile_approx("), s)
    assert(!s.contains("percentile(value"), s) // exact form absent
    // and the global (no-group) form — the q63 scale-killer shape — too
    val global = Quantiles.approxPercentiles(events, Nil, "value", Seq(0.05, 0.95))
    val gs = global.queryExecution.executedPlan.toString
    assert(gs.contains("percentile_approx("), gs)
    assert(!gs.contains("percentile(value"), gs)
  }

  test("HLL distinct estimates stay within 3×rsd of exact per group") {
    val checked = Quantiles.approxDistinctChecked(
      Tables.events(spark, sf001), Seq("event_type"), "user_id", "n_users")
    assert(checked.filter(!col("approx_ok")).count() == 0)
    // and the sketch-only operator returns one row per group
    val sketchOnly = Quantiles.approxDistinct(events, Seq("event_type"), "user_id")
    assert(sketchOnly.count() == events.select("event_type").distinct().count())
  }

  test("approx band filter keeps the middle of the distribution, drops tails") {
    val filtered = Quantiles.approxBandFilter(events, "value", 0.05, 0.95)
    val n = events.count().toDouble
    val kept = filtered.count().toDouble
    // ~90% band, generous tolerance for value ties at the boundary
    assert(kept / n > 0.80 && kept <= n, s"kept ${kept / n}")
    // the median always survives a (0.05, 0.95) band
    val med = events.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    assert(filtered.filter(col("value") === med).count() ==
      events.filter(col("value") === med).count())
  }

  test("band-filter count gate holds at the verify SF") {
    val scored = graft.ops.TextAnalysis.qualityScore(Tables.documents(spark, sf001))
      .select(col("doc_id"), col("mean_token_len"))
    val row = Quantiles.approxBandFilterChecked(scored, "mean_token_len", 0.05, 0.95)
      .head()
    assert(row.getBoolean(1), row.toString)
    assert(row.getLong(0) > 0)
  }

  test("MAD outliers: planted spike flagged, stddev-masked; zero-MAD group scores 0") {
    import spark.implicits._
    // group "a": tight cluster around 10 plus one huge spike. The spike
    // inflates the stddev enough that its own plain z-score is only ≈2.5σ —
    // the masking effect MAD is immune to.
    val a = Seq(9.0, 10.0, 10.0, 10.0, 11.0, 10.5, 9.5, 1000.0).map(("a", _))
    val b = Seq(5.0, 5.0, 5.0, 5.0).map(("b", _)) // MAD = 0
    val got = Quantiles.madOutlierScores(
      (a ++ b).toDF("g", "v"), Seq("g"), "v")
      .as[(String, Double, Double, Boolean)].collect()
    val spike = got.find(r => r._1 == "a" && r._2 == 1000.0).get
    assert(spike._4, s"spike not flagged: $spike")
    assert(got.filter(r => r._1 == "a" && r._2 != 1000.0).forall(!_._4))
    got.filter(_._1 == "b").foreach { r =>
      assert(r._3 == 0.0 && !r._4, s"zero-MAD group mis-scored: $r")
    }
    // the masking check: plain z of the spike is only ≈2.5 despite being
    // 100x the cluster (stddev ≈ 350 because of the spike itself)
    val vs = a.map(_._2); val mean = vs.sum / vs.size
    val sd = math.sqrt(vs.map(x => (x - mean) * (x - mean)).sum / (vs.size - 1))
    assert((1000.0 - mean) / sd < 2.6)
  }

  test("winsorizedStats: hand-computed fences, clamp counts, robust mean") {
    import spark.implicits._
    // 12 sorted values 0,10,…,100,1000: p10 = 11 (interp), p90 = 99
    val vals = (0 to 10).map(_ * 10.0) :+ 1000.0
    val df = vals.map(("g", _)).toDF("k", "v")
    val r = graft.ops.Quantiles
      .winsorizedStats(df, Seq("k"), "v", lo = 0.1, hi = 0.9)
      .collect().head
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Double]("p_lo") == 11.0)
    assert(r.getAs[Double]("p_hi") == 99.0)
    assert(r.getAs[Long]("n_clamped_low") == 2L)  // 0, 10 → 11
    assert(r.getAs[Long]("n_clamped_high") == 2L) // 100, 1000 → 99
    // raw mean (550+1000)/12; winsorized (2·11 + 20+…+90 + 2·99)/12 = 55
    assert(r.getAs[Double]("mean_raw") == 129.166667)
    assert(r.getAs[Double]("mean_winsorized") == 55.0)
  }

  test("audienceOverlap: hand-computed pair counts, Jaccard ppm, HLL gate") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 3L), // dup event collapses
      ("B", 2L), ("B", 3L), ("B", 4L),
      ("C", 9L)
    ).toDF("event_type", "user_id")
    val rows = graft.ops.Quantiles.audienceOverlap(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = rows(("A", "B"))
    assert(ab.getAs[Long]("n_a") == 3L)
    assert(ab.getAs[Long]("n_b") == 3L)
    assert(ab.getAs[Long]("n_both") == 2L)
    assert(ab.getAs[Long]("n_union") == 4L)
    assert(ab.getAs[Long]("jaccard_ppm") == 500000L)
    // disjoint pairs never appear (inner co-presence join) — C pairs absent
    assert(!rows.contains(("A", "C")) && !rows.contains(("B", "C")))
    // the sketch estimate must sit inside the gate on every emitted row
    assert(rows.values.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("ksStatisticPairs: 0 for identical distributions, 1e6 for disjoint") {
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 10L), ("b", 20L), ("b", 30L), // identical to a
      ("c", 100L), ("c", 110L)) // fully above both
      .flatMap { case (g, v) => Seq((g, v)) }
      .toDF("source", "n_chars")
    val ks = graft.ops.Quantiles
      .ksStatisticPairs(df, "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("ks_ppm")).toMap
    assert(ks(("a", "b")) == 0L)
    assert(ks(("a", "c")) == 1000000L) // complete separation
    assert(ks(("b", "c")) == 1000000L)
  }

  test("ksFromCounts equals the pairwise form on the same two groups") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 35L),
      ("b", 10L), ("b", 25L), ("b", 40L)).toDF("source", "n_chars")
    val pairwise = graft.ops.Quantiles
      .ksStatisticPairs(df, "source", "n_chars").collect().head
    val ha = df.filter(col("source") === "a")
      .groupBy(col("n_chars")).agg(count(lit(1)).as("n"))
    val hb = df.filter(col("source") === "b")
      .groupBy(col("n_chars")).agg(count(lit(1)).as("n"))
    val twoRel = graft.ops.Quantiles
      .ksFromCounts(ha, hb, "n_chars", "n").collect().head
    assert(twoRel.getAs[Long]("ks_ppm") == pairwise.getAs[Long]("ks_ppm"))
    assert(twoRel.getAs[Long]("n_a") == pairwise.getAs[Long]("n_a"))
  }

  test("giniByGroup: 0 for uniform mass, (n-1)/n for one-hot") {
    val df = Seq(
      ("even", 1L, 50L), ("even", 2L, 50L), ("even", 3L, 50L),
      ("even", 4L, 50L),
      ("hot", 5L, 0L), ("hot", 6L, 0L), ("hot", 7L, 0L), ("hot", 8L, 90L),
      ("zero", 9L, 0L)).toDF("source", "doc_id", "n_chars")
    val g = graft.ops.Quantiles
      .giniByGroup(df, "source", "n_chars", "doc_id").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(g("even") == 0.0)
    assert(g("hot") == 0.75) // (n-1)/n with n=4
    assert(g("zero") == 0.0) // all-zero sentinel, no division error
  }

  test("rankUniformScores uniformizes each group to the same mid-rank grid") {
    // two sources with wildly different scales; same group size → the
    // multiset of uniform scores must be IDENTICAL across groups
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 500L), (3L, "a", 70L), (4L, "a", 2L),
      (5L, "b", 1L), (6L, "b", 3L), (7L, "b", 2L), (8L, "b", 4L)
    ).toDF("doc_id", "source", "n_chars")
    val out = graft.ops.Quantiles
      .rankUniformScores(df, "source", "n_chars", "doc_id")
      .collect()
    val byGroup = out.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getAs[Double]("uniform_score")).sorted.toSeq)
    // mid-rank grid for n=4: (2k-1)/8
    assert(byGroup("a") == Seq(0.125, 0.375, 0.625, 0.875))
    assert(byGroup("a") == byGroup("b"))
    // rank follows the value within the group: doc 4 (n_chars=2) lowest
    val aScores = out.filter(_.getString(1) == "a")
      .map(r => r.getLong(0) -> r.getAs[Double]("uniform_score")).toMap
    assert(aScores(4L) == 0.125 && aScores(2L) == 0.875)
  }

  test("rankSumPairs: hand-computed 2U with ties; identical dists = 500000") {
    // a = {5,5,3}, b = {5,2,2,1}: U_a = 2*3.5 + 3 = 10 -> u2 = 20,
    // auc_ppm = 1e6*20 DIV 24 = 833333
    val df = Seq(
      ("a", 5L), ("a", 5L), ("a", 3L),
      ("b", 5L), ("b", 2L), ("b", 2L), ("b", 1L),
      ("c", 1L), ("c", 2L), ("c", 3L), ("d", 1L), ("d", 2L), ("d", 3L)
    ).toDF("source", "n_chars")
    val got = graft.ops.Quantiles.rankSumPairs(df, "source", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("u2"), r.getAs[Long]("auc_ppm")))).toMap
    assert(got(("a", "b")) == ((3L, 4L, 20L, 833333L)))
    // identical distributions: exactly the no-shift midpoint
    assert(got(("c", "d")) == ((3L, 3L, 9L, 500000L)))
    // every unordered pair appears exactly once, a < b
    assert(got.keySet.forall { case (a, b) => a < b } && got.size == 6)
  }

  test("psiByGroup: 0 for identical dists, hand-computed clamp-shift; " +
    "no-reference group dropped") {
    val rows =
      (0 to 9).map(v => ("same", v.toLong, true)) ++
      (0 to 9).map(v => ("same", v.toLong, false)) ++
      (0 to 9).map(v => ("shift", v.toLong, true)) ++
      (0 to 9).map(v => ("shift", v.toLong + 100L, false)) ++ // clamp to bin 9
      Seq(("norf", 1L, false))
    val df = rows.toDF("source", "n_chars", "is_ref")
    val got = graft.ops.Quantiles
      .psiByGroup(df, "source", "n_chars", col("is_ref"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi")))).toMap
    assert(got.keySet == Set("same", "shift")) // no baseline -> no row
    assert(got("same") == ((10L, 10L, 0.0)))
    // bins 0..8: (1/20 - 2/20)*ln(0.5) each; bin 9: (11/20 - 2/20)*ln(5.5)
    assert(got("shift") == ((10L, 10L, 1.079053)))
  }

  test("catAssociation: hand-computed 2x2 chi-square and Cramér's V; " +
    "independent and one-class inputs score 0") {
    def rows(spec: (String, String, Int)*) =
      spec.flatMap { case (a, b, k) => Seq.fill(k)((a, b)) }
        .toDF("lang", "source")
    // 30/10/10/30 over equal margins: every e = 20, chi2 = 4*(10^2/20),
    // V = sqrt(20 / (80*1)) = 0.5
    val skew = graft.ops.Quantiles.catAssociation(
      rows(("x", "u", 30), ("x", "v", 10), ("y", "u", 10), ("y", "v", 30)),
      "lang", "source").as[(Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(skew == ((80L, 2L, 2L, 1L, 20.0, 0.5)))
    val indep = graft.ops.Quantiles.catAssociation(
      rows(("x", "u", 10), ("x", "v", 10), ("y", "u", 10), ("y", "v", 10)),
      "lang", "source").as[(Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(indep == ((40L, 2L, 2L, 1L, 0.0, 0.0)))
    val oneClass = graft.ops.Quantiles.catAssociation(
      rows(("x", "u", 5), ("y", "u", 5)),
      "lang", "source").as[(Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(oneClass == ((10L, 2L, 1L, 0L, 0.0, 0.0)))
  }

  test("jackknifeGroupInfluence: hand-computed leave-out means, " +
    "influences, and textbook jackknife SE") {
    // A: ppm {1e6, 0}; B: {1e6}. loo(A) = 1.0, loo(B) = 0.5,
    // overall = 2/3; SE = sqrt((k-1)/k * sum((theta - mean)^2))
    //   = sqrt(0.5 * 0.125) = 0.25
    val df = Seq(("A", 1000000L), ("A", 0L), ("B", 1000000L))
      .toDF("source", "ppm")
    val got = graft.ops.Quantiles
      .jackknifeGroupInfluence(df, "source", col("ppm"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 2L, 1.0, 0.333333, 0.25)))
    assert(got("B") == (("B", 1L, 0.5, -0.166667, 0.25)))
  }

  test("psiFromCounts (histogram form) equals psiByGroup (row form)") {
    val rows =
      (0 to 9).flatMap(v => Seq.fill(v + 1)(("g", v.toLong, true))) ++
      (0 to 9).flatMap(v => Seq.fill(10 - v)(("g", v.toLong * 3, false)))
    val df = rows.toDF("source", "n_chars", "is_ref")
    val rowForm = graft.ops.Quantiles
      .psiByGroup(df, "source", "n_chars", col("is_ref"))
      .select("n_ref", "n_cur", "psi")
      .as[(Long, Long, Double)].collect().head
    val hist = (side: Boolean) => df.filter(col("is_ref") === side)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("n"))
    val histForm = graft.ops.Quantiles
      .psiFromCounts(hist(false), hist(true), "n_chars", "n")
      .as[(Long, Long, Double)].collect().head
    assert(rowForm == histForm && rowForm._3 > 0.0)
  }
}
