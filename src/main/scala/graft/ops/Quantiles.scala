package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-sketch tier for quantiles and distinct counts (north-star
  * extension; the 100 TB companion to the exact forms in q52/q63/q35).
  *
  * Exact `percentile` is a TypedImperativeAggregate that buffers EVERY group
  * value in one aggregation state — for a global percentile that is the
  * whole corpus' doubles in a single task, which does not survive corpus
  * scale. The sketch tier replaces it:
  *
  *   - quantiles: `percentile_approx` (Greenwald–Khanna summary) — state is
  *     O(accuracy · log n) regardless of group size, mergeable, with a hard
  *     rank-error guarantee of n/accuracy;
  *   - distinct counts: `approx_count_distinct` (HyperLogLog++) — fixed
  *     ~kilobytes of register state per group, relative error ≈ rsd,
  *     and the register merge is commutative max, so results are
  *     deterministic under any partitioning.
  *
  * The `...Checked` variants compute BOTH tiers and emit the exact values
  * plus boolean gates asserting the sketch landed inside its guaranteed
  * error band — that is what makes the approximate tier ORACLE-CHECKABLE:
  * DuckDB recomputes the exact side and the gates must read `true`. At
  * production scale you run only the sketch tier (`approxPercentiles` /
  * `approxDistinct` / `approxBandFilter`).
  */
object Quantiles {

  /** Default GK accuracy: rank error ≤ n/10000 (Spark's own default). */
  val DefaultAccuracy = 10000

  private def labelOf(p: Double): String = {
    val pct = p * 100
    if (pct == pct.floor) s"p${pct.toInt}" else s"p${pct}".replace('.', '_')
  }

  /** Sketch-only per-group quantiles — the operator you run at corpus scale.
    * One hash aggregation; state bounded by `accuracy`, not group size.
    */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        ps: Seq[Double], accuracy: Int = DefaultAccuracy): DataFrame = {
    val arr = percentile_approx(col(valueCol),
      array(ps.map(lit): _*), lit(accuracy))
    df.groupBy(groupCols.map(col): _*)
      .agg(arr.as("__ap"))
      .select(groupCols.map(col) ++
        ps.zipWithIndex.map { case (p, i) =>
          element_at(col("__ap"), i + 1).as(labelOf(p))
        }: _*)
  }

  /** Exact + sketch quantiles with a per-quantile correctness gate: the
    * sketch value must land inside the exact value band
    * [percentile(p − rankDelta), percentile(p + rankDelta)]. The GK
    * guarantee is rank error ≤ 1/accuracy, so any rankDelta ≫ 1/accuracy
    * (default 0.01 vs 1e-4) must hold on EVERY dataset — a false gate means
    * the sketch (or its merge) is broken, not the data.
    *
    * Output: groupCols, one exact column per p (named p50/p90/...), one
    * boolean `<label>_ok` per p.
    */
  def approxPercentilesChecked(df: DataFrame, groupCols: Seq[String], valueCol: String,
                               ps: Seq[Double], rankDelta: Double = 0.01,
                               accuracy: Int = DefaultAccuracy): DataFrame = {
    val v = valueCol
    val exact = ps.map(p => expr(s"percentile($v, $p)").as(labelOf(p)))
    val bandLo = ps.map(p =>
      expr(s"percentile($v, ${math.max(0.0, p - rankDelta)})").as(s"__lo_${labelOf(p)}"))
    val bandHi = ps.map(p =>
      expr(s"percentile($v, ${math.min(1.0, p + rankDelta)})").as(s"__hi_${labelOf(p)}"))
    val approx = percentile_approx(col(v), array(ps.map(lit): _*), lit(accuracy)).as("__ap")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(exact.head, (exact.tail ++ bandLo ++ bandHi :+ approx): _*)
    agg.select(groupCols.map(col) ++
      ps.map(p => col(labelOf(p))) ++
      ps.zipWithIndex.map { case (p, i) =>
        val l = labelOf(p)
        element_at(col("__ap"), i + 1)
          .between(col(s"__lo_$l"), col(s"__hi_$l")).as(s"${l}_ok")
      }: _*)
  }

  /** Sketch-only per-group distinct counts (HLL++). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(keyCol), rsd).as(s"approx_n_$keyCol"))

  /** Exact + HLL distinct count with a relative-error gate: the estimate
    * must be within `relTol` of exact (or ±1 absolute for tiny groups).
    * relTol derives from the requested rsd (3× — a ≈99.7% band) unless
    * explicitly overridden, so a red gate means broken sketch, not
    * statistical bad luck, at ANY rsd.
    */
  def approxDistinctChecked(df: DataFrame, groupCols: Seq[String], keyCol: String,
                            outCol: String, rsd: Double = 0.05,
                            relTol: Double = Double.NaN): DataFrame = {
    val tol = if (relTol.isNaN) 3.0 * rsd else relTol
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(keyCol)).as(outCol),
        approx_count_distinct(col(keyCol), rsd).as("__a"))
      .select(groupCols.map(col) :+ col(outCol) :+
        (abs(col("__a") - col(outCol)).cast("double") <=
          greatest(lit(1.0), col(outCol).cast("double") * tol)).as("approx_ok"): _*)
  }

  /** Robust (MAD-based) outlier scores per group: modified z =
    * 0.6745·(x − median) / MAD, MAD = median(|x − median|) — the
    * outlier detector that survives what breaks q93's mean/stddev z-score
    * (a single huge day inflates the stddev and masks itself; medians
    * don't move). Two exact-percentile passes over the GROUPED values —
    * fine at a bounded per-key grain (e.g. daily totals); for raw corpus
    * values use the approx tier. A zero MAD (> 50% of the group identical)
    * yields score 0 rather than an ANSI division error.
    */
  def madOutlierScores(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       threshold: Double = 3.5): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withDev = df.join(med, groupCols)
      .withColumn("__dev", abs(v - col("__med")))
    val mad = withDev.groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    val z = when(col("__mad") > 0,
      round(lit(0.6745) * (v - col("__med")) / col("__mad"), 6))
      .otherwise(lit(0.0))
    withDev.join(mad, groupCols)
      .select(df.columns.map(col).toSeq :+ z.as("robust_z") :+
        (abs(z) > threshold).as("is_outlier"): _*)
  }

  /** Sketch-tier outlier-band filter — the scale twin of the q63 pattern:
    * keep rows whose `valueCol` lies within the [pLo, pHi] approximate
    * quantile band. ONE pass to sketch the bounds (bounded state), one
    * broadcast of a 1-row bounds relation; the corpus never shuffles.
    */
  def approxBandFilter(df: DataFrame, valueCol: String,
                       pLo: Double, pHi: Double,
                       accuracy: Int = DefaultAccuracy): DataFrame = {
    val bounds = df.agg(
      percentile_approx(col(valueCol), array(lit(pLo), lit(pHi)), lit(accuracy)).as("__b"))
      .select(element_at(col("__b"), 1).as("__lo"), element_at(col("__b"), 2).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Band-filter correctness gate, count-based: |{rows in approx band}| may
    * differ from |{rows in exact band}| only by the GK rank-error slack —
    * each bound's rank is off by at most n/accuracy, plus ≤ 2 ranks of
    * interpolation-convention gap between GK (returns a sample) and exact
    * `percentile` (interpolates on (n−1)·p), for ⌈2·(2n/accuracy + 2)⌉
    * total. Output is one row (n_exact, approx_band_ok) — DuckDB
    * recomputes n_exact and the gate must be true.
    */
  def approxBandFilterChecked(df: DataFrame, valueCol: String,
                              pLo: Double, pHi: Double,
                              accuracy: Int = DefaultAccuracy): DataFrame = {
    val v = col(valueCol)
    val bounds = df.agg(
      expr(s"percentile($valueCol, $pLo)").as("__lo_e"),
      expr(s"percentile($valueCol, $pHi)").as("__hi_e"),
      percentile_approx(v, array(lit(pLo), lit(pHi)), lit(accuracy)).as("__b"))
    df.crossJoin(broadcast(bounds))
      .agg(
        sum(when(v.between(col("__lo_e"), col("__hi_e")), 1L).otherwise(0L)).as("n_exact"),
        sum(when(v.between(element_at(col("__b"), 1), element_at(col("__b"), 2)), 1L)
          .otherwise(0L)).as("__n_approx"),
        count(lit(1)).as("__n"))
      .select(col("n_exact"),
        (abs(col("__n_approx") - col("n_exact")).cast("double") <=
          ceil(lit(2.0) * (lit(2.0) * col("__n") / accuracy + lit(2.0))).cast("double"))
          .as("approx_band_ok"))
  }

  /** Winsorized (clamped) statistics per group — tail-robust numeric
    * cleaning for feature columns: values below the `lo` quantile or
    * above the `hi` quantile are clamped to the boundary, and the mean
    * is reported before and after. The fences are rounded to 6 decimals
    * BEFORE clamping (NOTES_r3 round-before-compare discipline: both
    * engines' interpolated percentiles agree only to the last ulp, and
    * the clamp is a threshold compare), so the clamped multiset is
    * engine-identical.
    *
    * Shape at corpus scale: one exact-percentile aggregate per group
    * (groups-sized relation), broadcast back onto the fact rows, then
    * one map-side-combinable mean pass — the fact table is scanned
    * twice but never shuffled on anything but the group key.
    */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, lo: Double = 0.01,
                      hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val fences = df.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(round(expr(s"percentile($valueCol, ${lo}D)"), 6).as("__plo"),
        round(expr(s"percentile($valueCol, ${hi}D)"), 6).as("__phi"))
    df.join(broadcast(fences), groupCols)
      .groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"),
        round(avg(col(valueCol)), 6).as("mean_raw"),
        first(col("__plo")).as("p_lo"),
        first(col("__phi")).as("p_hi"),
        round(avg(greatest(col("__plo"),
          least(col("__phi"), col(valueCol)))), 6).as("mean_winsorized"),
        sum(when(col(valueCol) < col("__plo"), lit(1L))
          .otherwise(lit(0L))).as("n_clamped_low"),
        sum(when(col(valueCol) > col("__phi"), lit(1L))
          .otherwise(lit(0L))).as("n_clamped_high"))
  }

  /** Frozen-fences snapshot producer for the STREAMING winsorizer (the
    * mixtureGate snapshot discipline): per-group rounded p-lo/p-hi
    * fences collected to a driver map — a groups-sized relation by
    * construction. Refresh periodically batch-side; the stream applies
    * the latest snapshot map-only.
    */
  def winsorFences(df: DataFrame, typeCol: String, valueCol: String,
                   lo: Double = 0.01, hi: Double = 0.99): Map[String, (Double, Double)] = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    df.groupBy(col(typeCol))
      .agg(round(expr(s"percentile($valueCol, ${lo}D)"), 6).as("__plo"),
        round(expr(s"percentile($valueCol, ${hi}D)"), 6).as("__phi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
  }

  /** Distinct-audience overlap between every pair of segments (event
    * types): exact Jaccard in ppm plus an HLL-sketch union estimate
    * gated against the exact union (the q71/q182 checked-twin
    * discipline — a red gate means broken sketch algebra, not bad
    * statistical luck).
    *
    * Scale shape: event volume reduces ONCE to distinct (type, user)
    * pairs (map-side combinable). Pairwise co-presence is a per-USER
    * keyed self-join — each user contributes at most |types|² rows, so
    * no hot key and no types×users blow-up in any single task. Per-type
    * sketches and exact counts live on a types-sized relation; the
    * pair join is broadcast-sized. At petabyte scale, set relTol from
    * the sketch's lgK rather than trusting defaults — and when only the
    * ESTIMATE is needed, the exact lanes (the countDistinct and the
    * co-presence join) drop out entirely and sketches alone survive.
    */
  def audienceOverlap(df: DataFrame, typeCol: String = "event_type",
                      userCol: String = "user_id", lgK: Int = 12,
                      relTol: Double = 0.15): DataFrame = {
    val ut = df.select(col(typeCol).as("__t"), col(userCol).as("__u"))
      .distinct()
    val per = ut.groupBy(col("__t"))
      .agg(count(lit(1)).as("__n"),
        expr(s"hll_sketch_agg(__u, $lgK)").as("__sk"))
    val both = ut.as("x").join(ut.as("y"), col("x.__u") === col("y.__u"))
      .filter(col("x.__t") < col("y.__t"))
      .groupBy(col("x.__t").as("type_a"), col("y.__t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(per.select(col("__t"), col("__n").as("n_a"),
        col("__sk").as("__ska"))), col("type_a") === col("__t"))
      .drop("__t")
      .join(broadcast(per.select(col("__t"), col("__n").as("n_b"),
        col("__sk").as("__skb"))), col("type_b") === col("__t"))
      .drop("__t")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        (col("n_a") + col("n_b") - col("n_both")).as("n_union"),
        expr("1000000 * n_both DIV (n_a + n_b - n_both)")
          .as("jaccard_ppm"),
        expr("hll_sketch_estimate(hll_union(__ska, __skb))").as("__est"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("n_union"), col("jaccard_ppm"),
        (abs(col("__est") - col("n_union")).cast("double") <=
          greatest(lit(1.0), col("n_union").cast("double") * relTol))
          .as("approx_ok"))
  }

  /** Quantile normalization to uniform [0, 1]: each row's value is
    * replaced by its mid-rank fraction (2·rank − 1) / (2·n) WITHIN its
    * group — after it, every group's score distribution is identical
    * (uniform), which is how a per-source quality/length score becomes
    * comparable across sources with different score scales (source A's
    * "good" and source B's "good" both land at 0.9). Deterministic and
    * engine-exact: rank and n are integers (ties broken by `idCol`), the
    * one division rounds to 6.
    *
    * Scale note: one hash-partitioned window per group — the standard
    * rank shuffle. A group hot enough to bottleneck a window at 100 TB
    * should pre-aggregate to (value, count) histograms first (the q108
    * discipline); for typical per-source corpora the plain window holds.
    */
  /** Per-group Gini coefficient of a nonnegative value — how unequally
    * the mass (doc lengths, token counts, event values) concentrates
    * within each group; 0 = perfectly even, →1 = one row holds
    * everything. The sorted-rank identity
    * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) is EXACT integer arithmetic
    * from a group-keyed rank window until the one rounded division
    * (ties ranked by `idCol`; any tie order yields the same Σ i·x_i
    * within a tie class — the statistic is still deterministic). An
    * all-zero group emits 0.
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x").asc, col(idCol).asc)
    df.select(col(groupCol), col(idCol),
        col(valueCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__s0"),
        sum(col("__i") * col("__x")).as("__s1"))
      .select(col(groupCol), col("n"),
        when(col("__s0") > 0,
          round((lit(2L) * col("__s1") - (col("n") + lit(1L)) * col("__s0"))
              .cast("double") /
            (col("n") * col("__s0")).cast("double"), 6))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Pairwise two-sample Kolmogorov–Smirnov distance between every two
    * groups' value distributions — the distribution-shift test behind
    * "did source X's length profile drift from source Y's" (and the
    * pre-mixing check that two providers' corpora are actually
    * different). ENTIRELY integer: per-(group, value) counts fan out per
    * pair, the ECDF difference at value v is |cumA·nB − cumB·nA| (a
    * BIGINT — no floating ECDFs), D = max over the merged support, and
    * the output is D ppm via integer DIV. One count reduction, pair-keyed
    * cumulative windows over the |support|-sized relation — the corpus
    * never rides the pair fan-out.
    */
  def ksStatisticPairs(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val totals = counts.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val pairs = totals
      .select(col("__g").as("source_a"), col("__n").as("__na"))
      .crossJoin(broadcast(totals
        .select(col("__g").as("source_b"), col("__n").as("__nb"))))
      .filter(col("source_a") < col("source_b"))
    val va = pairs.select("source_a", "source_b")
      .join(counts.select(col("__g").as("source_a"), col("__v"),
        col("__c").as("__ca")), "source_a")
    val vb = pairs.select("source_a", "source_b")
      .join(counts.select(col("__g").as("source_b"), col("__v"),
        col("__c").as("__cb")), "source_b")
    val merged = va.join(vb, Seq("source_a", "source_b", "__v"),
        "full_outer")
      .select(col("source_a"), col("source_b"), col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source_a"), col("source_b"))
      .orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    merged
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .join(broadcast(pairs), Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("__na"), col("__nb"),
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na"))
          .as("__d"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
        max(col("__d")).as("__dmax"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        expr("1000000 * __dmax DIV (n_a * n_b)").as("ks_ppm"))
  }

  /** Two-relation KS from PRE-AGGREGATED (value, count) histograms — the
    * monitor form of [[ksStatisticPairs]] (a streaming count snapshot vs
    * a frozen reference). Same integer ECDF cross-product math; a unit
    * test pins this form equal to the pairwise form on the same data.
    * Returns one row (n_a, n_b, ks_ppm).
    */
  def ksFromCounts(a: DataFrame, b: DataFrame, valueCol: String,
                   countCol: String): DataFrame = {
    val av = a.select(col(valueCol).cast("long").as("__v"),
      col(countCol).cast("long").as("__ca"))
    val bv = b.select(col(valueCol).cast("long").as("__v"),
      col(countCol).cast("long").as("__cb"))
    val merged = av.join(bv, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = merged.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    merged
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .crossJoin(broadcast(tot))
      .select(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na"))
        .as("__d"), col("__na"), col("__nb"))
      .groupBy()
      .agg(first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
        max(col("__d")).as("__dmax"))
      .select(col("n_a"), col("n_b"),
        expr("1000000 * __dmax DIV (n_a * n_b)").as("ks_ppm"))
  }

  def rankUniformScores(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col(groupCol), col(valueCol),
        round((lit(2L) * col("__rn") - lit(1L)).cast("double") /
          (lit(2L) * col("__n")).cast("double"), 6).as("uniform_score"))
  }
}
