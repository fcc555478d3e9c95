package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-model fitting — the "small-d, huge-n" pattern: all
  * model state is a handful of moment sums, so a fit over 100 TB is ONE
  * map-side-combinable aggregate (d² + d + 2 numbers cross the wire per
  * partition) followed by a closed-form solve on the 1-row result. No
  * iteration, no driver-side data movement, no ML runtime.
  *
  *   - [[groupTrend]]: per-group simple regression (slope / intercept /
  *     r²) — the monitoring primitive for "is this metric drifting";
  *   - [[olsCoefficients]] / [[olsFit]]: multiple OLS via the normal
  *     equations, solved by Cramer's rule on the (d+1)×(d+1) moment
  *     matrix. d is tiny (a handful of features), so determinant
  *     expansion is cheap and — crucially for the oracle contract —
  *     expressible as a pure arithmetic formula over the sums.
  *
  * Cross-engine determinism: callers feed INTEGER-VALUED columns (scale
  * fixed-decimal features up: cents, basis points). Integer products below
  * 2^53 sum EXACTLY in IEEE double regardless of partition order, and the
  * solve is generated ONCE as SQL text ([[olsSolveSqlChain]]) that both
  * Spark (`selectExpr`) and an independent SQL engine evaluate — identical
  * inputs through an identical expression tree is bit-identical output,
  * no tolerance needed.
  */
object Regression {

  /** Per-group simple linear regression of `yCol` on `xCol`.
    *
    * Output: group cols + `n_rows`, `slope`, `intercept`, `r2` (rounded
    * to `scale`; NULL when degenerate — a single point or zero x/y
    * variance). One shuffle (the groupBy), partial-aggregated map-side.
    *
    * Determinism contract: integer-valued x and y (see object doc); the
    * closed-form arithmetic below mirrors [[groupTrendFormulaSql]]
    * term-for-term.
    */
  def groupTrend(df: DataFrame, groupCols: Seq[String],
                 xCol: String, yCol: String, scale: Int = 6): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val agg0 = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    // identical formula text on both engines (see groupTrendExprsSql)
    agg0.selectExpr(groupCols ++ ("n_rows" +: groupTrendExprsSql(scale)): _*)
  }

  /** The slope/intercept/r² solve as three SQL expressions over columns
    * `n_rows, sx, sy, sxy, sxx, syy` — shared verbatim with the oracle.
    */
  def groupTrendExprsSql(scale: Int = 6): Seq[String] = {
    val n = "CAST(n_rows AS DOUBLE)"
    val dx = s"($n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val dy = s"($n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val cov = s"($n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val slope = s"($cov / $dx)"
    Seq(
      s"CASE WHEN $dx = 0e0 THEN NULL ELSE round($slope, $scale) END AS slope",
      s"CASE WHEN $dx = 0e0 THEN NULL ELSE round((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / $n, $scale) END AS intercept",
      s"CASE WHEN $dx = 0e0 OR $dy = 0e0 THEN NULL ELSE round(($cov * $cov) / ($dx * $dy), $scale) END AS r2")
  }

  // ----------------------------------------------------- multiple OLS

  /** Cofactor-expansion determinant over a matrix of SQL sub-expressions.
    * Recursion depth = matrix size (≤ 5 in practice) — the generated text
    * is identical for both engines, which is the whole point.
    */
  private def detSql(m: Vector[Vector[String]]): String =
    if (m.size == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(row =>
        row.indices.collect { case i if i != j => row(i) }.toVector)
      val t = s"(${m(0)(j)}) * (${detSql(minor)})"
      if (j == 0) t else if (j % 2 == 1) s" - $t" else s" + $t"
    }.mkString

  /** Canonical column names for the moment sums of a d-predictor fit with
    * intercept: x_0 ≡ 1, so `s_i_j` (i ≤ j) covers n (= s_0_0), the
    * plain sums (s_0_j) and the cross-products; `t_i` = Σ x_i·y;
    * `syy` = Σ y².
    */
  private def sName(i: Int, j: Int): String =
    if (i <= j) s"s_${i}_$j" else s"s_${j}_$i"

  /** Stage 1 — the single corpus pass: all moment sums as exact BIGINTs.
    * Requires integer-valued inputs with pairwise products < 2^53.
    */
  def normalEquationSums(df: DataFrame, yCol: String,
                         xCols: Seq[String]): DataFrame = {
    require(xCols.nonEmpty)
    val xs = lit(1L).cast("double") +: xCols.map(col)
    val aggs =
      (for (i <- xs.indices; j <- xs.indices if i <= j)
        yield sum((xs(i) * xs(j)).cast("long")).as(sName(i, j))) ++
      xs.indices.map(i => sum((xs(i) * col(yCol)).cast("long")).as(s"t_$i")) :+
      sum((col(yCol) * col(yCol)).cast("long")).as("syy")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The matching oracle text for [[normalEquationSums]] (DuckDB sums
    * BIGINT into HUGEINT — cast back down).
    */
  def normalEquationSumsSql(source: String, yExpr: String,
                            xExprs: Seq[String]): String = {
    val xs = "CAST(1 AS BIGINT)" +: xExprs
    val items =
      (for (i <- xs.indices; j <- xs.indices if i <= j)
        yield s"CAST(sum((${xs(i)}) * (${xs(j)})) AS BIGINT) AS ${sName(i, j)}") ++
      xs.indices.map(i =>
        s"CAST(sum((${xs(i)}) * ($yExpr)) AS BIGINT) AS t_$i") :+
      s"CAST(sum(($yExpr) * ($yExpr)) AS BIGINT) AS syy"
    s"SELECT ${items.mkString(",\n  ")} FROM $source"
  }

  /** Stage 2 — the Cramer solve as two chained projections over the sums
    * row: first the determinants, then the coefficients `b_0 … b_d`
    * (b_0 = intercept). Returned as SQL expression lists so Spark
    * (`selectExpr("*", …)`) and the oracle (nested CTE SELECTs) evaluate
    * the IDENTICAL text.
    */
  def olsSolveSqlChain(d: Int): (Seq[String], Seq[String]) = {
    val dim = d + 1
    val a = Vector.tabulate(dim, dim)((i, j) =>
      s"CAST(${sName(i, j)} AS DOUBLE)")
    val dets = s"(${detSql(a)}) AS det" +: (0 until dim).map { i =>
      val ai = a.map(_.toVector).zipWithIndex.map { case (row, r) =>
        row.updated(i, s"CAST(t_$r AS DOUBLE)")
      }
      s"(${detSql(ai)}) AS det_$i"
    }
    val coefs = (0 until dim).map(i => s"(det_$i / det) AS b_$i")
    (dets, coefs)
  }

  /** Unrounded coefficients (1 row: the sums + det + b_0 … b_d) — reuse
    * for model SCORING (broadcast this row, predict map-side). Degenerate
    * design (det = 0) yields NULL/Inf coefficients; callers that can see
    * rank-deficient inputs should gate on `det`.
    */
  def olsCoefficients(df: DataFrame, yCol: String,
                      xCols: Seq[String]): DataFrame = {
    val (dets, coefs) = olsSolveSqlChain(xCols.size)
    normalEquationSums(df, yCol, xCols)
      .selectExpr("*" +: dets: _*)
      .selectExpr("*" +: coefs: _*)
  }

  /** R² text over the coefficient row (shared with the oracle): SSE/SST
    * from the same sums, `1 - SSE/SST` guarded against zero variance.
    */
  def olsR2Sql(d: Int, scale: Int = 6): String = {
    val n = "CAST(s_0_0 AS DOUBLE)"
    val sst = s"(CAST(syy AS DOUBLE) - CAST(t_0 AS DOUBLE) * CAST(t_0 AS DOUBLE) / $n)"
    val sse = s"(CAST(syy AS DOUBLE) - (${
      (0 to d).map(i => s"b_$i * CAST(t_$i AS DOUBLE)").mkString(" + ")}))"
    s"CASE WHEN $sst = 0e0 THEN NULL ELSE round(1e0 - $sse / $sst, $scale) END AS r2"
  }

  /** The full fit: one row — `n_rows`, rounded `b_*` (named after the
    * predictor columns, `intercept` for b_0) and `r2`.
    */
  def olsFit(df: DataFrame, yCol: String, xCols: Seq[String],
             scale: Int = 6): DataFrame = {
    val named = "intercept" +: xCols.map(x => s"b_$x")
    val finals = Seq("CAST(s_0_0 AS BIGINT) AS n_rows") ++
      named.zipWithIndex.map { case (nm, i) =>
        s"round(b_$i, $scale) AS $nm"
      } :+ olsR2Sql(xCols.size, scale)
    olsCoefficients(df, yCol, xCols).selectExpr(finals: _*)
  }

  /** The matching oracle: sums CTE → dets CTE → coefs CTE → final select,
    * every expression string shared with the Spark path above.
    */
  def olsFitSql(source: String, yExpr: String, xExprs: Seq[String],
                names: Seq[String], scale: Int = 6): String = {
    require(names.size == xExprs.size)
    val (dets, coefs) = olsSolveSqlChain(xExprs.size)
    val named = "intercept" +: names.map(n => s"b_$n")
    val finals = Seq("CAST(s_0_0 AS BIGINT) AS n_rows") ++
      named.zipWithIndex.map { case (nm, i) =>
        s"round(b_$i, $scale) AS $nm"
      } :+ olsR2Sql(xExprs.size, scale)
    s"""WITH ols_sums AS (${normalEquationSumsSql(source, yExpr, xExprs)}),
       |ols_dets AS (SELECT *, ${dets.mkString(",\n  ")} FROM ols_sums),
       |ols_coef AS (SELECT *, ${coefs.mkString(",\n  ")} FROM ols_dets)
       |SELECT ${finals.mkString(",\n  ")} FROM ols_coef""".stripMargin
  }

  /** Oracle CTE chain ending in `ols_coef` (unrounded b_i) — for queries
    * that SCORE with the model instead of reporting it (see q165).
    */
  def olsCoefSqlCtes(source: String, yExpr: String,
                     xExprs: Seq[String]): String = {
    val (dets, coefs) = olsSolveSqlChain(xExprs.size)
    s"""ols_sums AS (${normalEquationSumsSql(source, yExpr, xExprs)}),
       |ols_dets AS (SELECT *, ${dets.mkString(",\n  ")} FROM ols_sums),
       |ols_coef AS (SELECT *, ${coefs.mkString(",\n  ")} FROM ols_dets)""".stripMargin
  }

  /** Pearson correlation between the daily event-count series of two
    * segment values — the "do these signals move together" health check
    * (e.g. views vs purchases). Days where only one side fires count as
    * 0 on the other (full-outer join + 0-fill) — absence is signal for a
    * correlation, not a gap to skip.
    *
    * Determinism: counts are integers, so all five moment sums are
    * EXACT BIGINTs under any partitioning; r's numerator/denominator
    * factors are exact-integer-valued doubles (each < 2^53 for any
    * realistic day grain), and IEEE multiply/sqrt/divide on identical
    * inputs is engine-identical — round-6 is belt and braces. Scale: the
    * corpus collapses to a days×2 relation in one map-side-combinable
    * pass; everything after is day-grain.
    */
  def dailyCountCorrelation(df: DataFrame, tsCol: String, typeCol: String,
                            typeA: String, typeB: String): DataFrame = {
    require(typeA != typeB, "need two distinct segment values")
    val daily = df.filter(col(typeCol).isin(typeA, typeB))
      .groupBy((unix_timestamp(date_trunc("day", col(tsCol))) / 86400L)
        .cast("long").as("__day"), col(typeCol).as("__t"))
      .agg(count(lit(1)).as("__c"))
    val a = daily.filter(col("__t") === typeA)
      .select(col("__day"), col("__c").as("__ca"))
    val b = daily.filter(col("__t") === typeB)
      .select(col("__day"), col("__c").as("__cb"))
    val j = a.join(b, Seq("__day"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__x"),
        coalesce(col("__cb"), lit(0L)).as("__y"))
    j.agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .select(col("__n").as("n_days"), col("__sx").as("n_a"),
        col("__sy").as("n_b"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
          sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx"))
              .cast("double") *
            (col("__n") * col("__syy") - col("__sy") * col("__sy"))
              .cast("double")), 6).as("pearson_r"))
  }

  /** Per-group Spearman rank correlation between two value columns —
    * does metric A's ordering predict metric B's? (e.g. doc length vs
    * lexical richness per source: a monotone relationship survives any
    * nonlinear rescaling that breaks Pearson). Ranks come from
    * GROUP-KEYED windows (ties broken by `idCol` in BOTH rankings, so
    * the statistic is deterministic and engine-identical), and the
    * classic 1 − 6·Σd²/(n·(n²−1)) is EXACT integer arithmetic until
    * the single rounded division. Groups of size 1 emit rho = 0 (the
    * n³−n denominator would be 0; corr of a single point is undefined
    * and 0 is the portable sentinel).
    *
    * ⚠ TIE SEMANTICS — deliberately NOT the textbook statistic on tied
    * data: tied values get DISTINCT consecutive ranks (tie-broken by
    * `idCol`), not the average fractional rank scipy/pandas assign, so
    * on data with ties this deviates from `scipy.stats.spearmanr` /
    * `DataFrame.corr(method="spearman")` (tie-free data is identical).
    * The trade is intentional: integer ranks keep Σd² exact,
    * order-free, and reproducible by any engine with the same
    * tie-break, where fractional average ranks reintroduce float
    * summation order into the statistic. Comparing against a
    * pandas/scipy result? Expect drift proportional to the tie mass.
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, colA: String,
                      colB: String, idCol: String): DataFrame = {
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(desc(colA), col(idCol).asc)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(desc(colB), col(idCol).asc)
    df.select(col(groupCol), col(idCol), col(colA), col(colB))
      .withColumn("__ra", row_number().over(wa).cast("long"))
      .withColumn("__rb", row_number().over(wb).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__ra") - col("__rb")) * (col("__ra") - col("__rb")))
          .as("__sd2"))
      .select(col(groupCol), col("n"),
        when(col("n") > 1,
          round(lit(1.0) - (lit(6L) * col("__sd2")).cast("double") /
            (col("n") * (col("n") * col("n") - lit(1L))).cast("double"),
            6)).otherwise(lit(0.0)).as("spearman_rho"))
  }
}
