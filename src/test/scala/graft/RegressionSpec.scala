package graft

import org.apache.spark.sql.functions._
import graft.ops.Regression

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("groupTrend: recovers an exact line per group, degenerate → NULL") {
    val pts =
      (0 to 9).map(i => ("lin", i.toDouble, (2 * i + 1).toDouble)) ++
      Seq(("one", 5.0, 7.0)) ++                       // single point
      (0 to 4).map(i => ("flat", 3.0, i.toDouble))    // zero x-variance
    val got = Regression.groupTrend(pts.toDF("g", "x", "y"), Seq("g"),
        "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("lin") == (("lin", 10L, Some(2.0), Some(1.0), Some(1.0))))
    assert(got("one") == (("one", 1L, None, None, None)))
    assert(got("flat") == (("flat", 5L, None, None, None)))
  }

  test("groupTrend: r2 < 1 on noisy data, between 0 and 1") {
    val pts = Seq(0, 1, 2, 3, 4, 5).map(i =>
      ("g", i.toDouble, (3 * i + (if (i % 2 == 0) 1 else -1)).toDouble))
    val Some(r2) = Regression.groupTrend(pts.toDF("g", "x", "y"), Seq("g"),
      "x", "y").select("r2").as[Option[Double]].head()
    assert(r2 > 0.9 && r2 < 1.0)
  }

  test("olsFit: recovers an exact plane (intercept + 2 predictors)") {
    val rows = for (a <- 0 to 4; b <- 0 to 4)
      yield ((3 + 2 * a + 5 * b).toDouble, a.toDouble, b.toDouble)
    val fit = Regression.olsFit(rows.toDF("y", "a", "b"), "y",
      Seq("a", "b")).collect().head
    assert(fit.getAs[Long]("n_rows") == 25L)
    assert(fit.getAs[Double]("intercept") == 3.0)
    assert(fit.getAs[Double]("b_a") == 2.0)
    assert(fit.getAs[Double]("b_b") == 5.0)
    assert(fit.getAs[Double]("r2") == 1.0)
  }

  test("olsFit: 3 predictors, exact integer recovery") {
    val rows = for (a <- 0 to 2; b <- 0 to 2; c <- 0 to 2)
      yield ((10 - 4 * a + 7 * b + c).toDouble,
        a.toDouble, b.toDouble, c.toDouble)
    val fit = Regression.olsFit(rows.toDF("y", "a", "b", "c"), "y",
      Seq("a", "b", "c")).collect().head
    assert(fit.getAs[Double]("intercept") == 10.0)
    assert(fit.getAs[Double]("b_a") == -4.0)
    assert(fit.getAs[Double]("b_b") == 7.0)
    assert(fit.getAs[Double]("b_c") == 1.0)
    assert(fit.getAs[Double]("r2") == 1.0)
  }

  test("olsCoefficients: scoring finds a planted outlier") {
    // plane + one contaminated row: its residual dominates
    val rows = (for (a <- 0 to 4; b <- 0 to 4)
      yield ((1 + 2 * a + 3 * b).toDouble, a.toDouble, b.toDouble)) :+
      ((1000.0, 2.0, 2.0))
    val df = rows.toDF("y", "a", "b")
    val coef = Regression.olsCoefficients(df, "y", Seq("a", "b"))
      .select("b_0", "b_1", "b_2")
    val worst = df.crossJoin(broadcast(coef))
      .withColumn("resid", abs(col("y") - (col("b_0") +
        col("b_1") * col("a") + col("b_2") * col("b"))))
      .orderBy(col("resid").desc).select("y").as[Double].head()
    assert(worst == 1000.0)
  }

  test("olsSolveSqlChain: generated det text is engine-parseable at d=1") {
    // 2x2 Cramer — simple regression through the generic path agrees
    // with groupTrend's closed form
    val pts = (0 to 9).map(i => ((2 * i + 1).toDouble, i.toDouble))
    val fit = Regression.olsFit(pts.toDF("y", "x"), "y", Seq("x"))
      .collect().head
    assert(fit.getAs[Double]("intercept") == 1.0)
    assert(fit.getAs[Double]("b_x") == 2.0)
  }

  test("dailyCountCorrelation: 0-fill makes one-sided days kill a perfect r") {
    import spark.implicits._
    def ev(day: Int, t: String, n: Int) =
      Seq.fill(n)((s"2024-01-0$day 12:00:00", t))
    // days 1-2 are perfectly proportional; day 3 fires view only
    val df = (ev(1, "view", 1) ++ ev(1, "purchase", 1) ++
      ev(2, "view", 2) ++ ev(2, "purchase", 2) ++
      ev(3, "view", 2))
      .toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
    val r3 = Regression.dailyCountCorrelation(df, "ts", "event_type",
      "view", "purchase").collect().head
    assert(r3.getAs[Long]("n_days") == 3L)
    assert(r3.getAs[Long]("n_a") == 5L)
    assert(r3.getAs[Long]("n_b") == 3L)
    // x=[1,2,2], y=[1,2,0]: numerator 3·5 − 5·3 = 0 → r = 0 exactly
    assert(r3.getAs[Double]("pearson_r") == 0.0)
    // drop day 3 → perfectly correlated
    val r2 = Regression.dailyCountCorrelation(
      df.filter(dayofmonth(col("ts")) < 3), "ts", "event_type",
      "view", "purchase").collect().head
    assert(r2.getAs[Double]("pearson_r") == 1.0)
  }

  test("spearmanByGroup: +1 on concordant, -1 on reversed, 0 sentinel for n=1") {
    import spark.implicits._
    val df = Seq(
      // group "up": b ordering identical to a ordering
      ("up", 1L, 10L, 100L), ("up", 2L, 20L, 200L), ("up", 3L, 30L, 300L),
      // group "down": b ordering exactly reversed
      ("down", 4L, 10L, 300L), ("down", 5L, 20L, 200L),
      ("down", 6L, 30L, 100L),
      ("one", 7L, 5L, 5L))
      .toDF("source", "doc_id", "a", "b")
    val rho = Regression.spearmanByGroup(df, "source", "a", "b", "doc_id")
      .collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    assert(rho("up") == 1.0)
    assert(rho("down") == -1.0)
    assert(rho("one") == 0.0)
  }
}
