package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

class GroupedTopKSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf0001)

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))

  test("matches the window row_number formulation exactly") {
    val viaTopK = TopK.perGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(key).toSet
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(key).toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("k larger than any group returns everything") {
    val all = TopK.perGroup(li, Seq("l_returnflag"),
      Seq(("l_orderkey", false), ("l_linenumber", false)), 1000000).count()
    assert(all == li.count())
  }

  test("physical plan is partial → exchange → final, never a full sort") {
    val df = TopK.perGroup(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 3)
    df.collect() // force planning through AQE
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("GroupedTopKPartial"), s)
    assert(s.contains("GroupedTopKFinal"), s)
    assert(s.contains("Exchange"), s)
    assert(!s.contains("WindowExec"), s)
  }

  test("rejects non-positive k") {
    assertThrows[IllegalArgumentException](
      TopK.perGroup(li, Seq("l_suppkey"), Seq(("l_orderkey", false)), 0))
  }

  test("partial-pass group cap: beyond-cap groups pass through, result stays exact") {
    // one input partition with 150k distinct groups > PartialMaxGroups
    // (100k): the partial task tracks the first 100k groups and forwards
    // the rest unbuffered; the final pass must still be exact for ALL
    val n = 150000L
    val df = spark.range(2 * n)
      .selectExpr(s"id % $n AS g", "id AS v")
      .repartition(1)
    val top1 = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 1)
    assert(top1.count() == n) // every group present exactly once
    // top-1 by v ascending == min(v) per group
    val mismatches = top1.alias("t")
      .join(df.groupBy("g").agg(org.apache.spark.sql.functions.min("v").as("mv")), "g")
      .filter(col("v") =!= col("mv")).count()
    assert(mismatches == 0)
  }

  test("global top-k (no group keys) gathers to one partition, matches orderBy+limit") {
    val topk = TopK.perGroup(li, Nil,
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 5)
      .select("l_orderkey", "l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = li
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(5)
      .select("l_orderkey", "l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(topk == expected)
  }

  test("RowNumberTopKRewrite: window rn<=k with rn dropped plans as GroupedTopK") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ graft.plans.RowNumberTopKRewrite
      if (!spark.experimental.extraStrategies.contains(graft.plans.GroupedTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.GroupedTopKStrategy
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val rewritten = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      val rows = rewritten.collect()
      val s = rewritten.queryExecution.executedPlan.toString
      assert(s.contains("GroupedTopKFinal"), s)
      assert(!s.contains("WindowExec"), s)
      // identical rows to the un-rewritten window formulation
      val plain = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      assert(rows.map(_.toString).toSet == plain.collect().map(_.toString).toSet)
      // keeping rn in the output must NOT rewrite (rank is required)
      val keepsRn = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      keepsRn.collect()
      assert(!keepsRn.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("RowNumberTopKRewrite: widened literal shapes (long bound, casted literal, rn = 1)") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ graft.plans.RowNumberTopKRewrite
      if (!spark.experimental.extraStrategies.contains(graft.plans.GroupedTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.GroupedTopKStrategy
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      def build(pred: org.apache.spark.sql.Column) =
        li.withColumn("rn", row_number().over(w))
          .filter(pred)
          .select("l_suppkey", "l_orderkey", "l_linenumber")
      val windowPlain3 = build(col("rn") <= 3).collect().map(_.toString).toSet
      val windowPlain1 = build(col("rn") <= 1).collect().map(_.toString).toSet
      // rn <= 3L: rank behind a widening cast + a LONG literal bound
      val longBound = build(col("rn") <= lit(3L))
      assert(longBound.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"),
        longBound.queryExecution.executedPlan.toString)
      assert(longBound.collect().map(_.toString).toSet == windowPlain3)
      // rn <= CAST(3 AS INT): literal behind a foldable cast
      val castBound = build(col("rn") <= expr("CAST(3 AS INT)"))
      assert(castBound.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"),
        castBound.queryExecution.executedPlan.toString)
      assert(castBound.collect().map(_.toString).toSet == windowPlain3)
      // rn = 1 (both literal positions)
      for (p <- Seq(col("rn") === 1L, lit(1) === col("rn"))) {
        val eq1 = build(p)
        assert(eq1.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"),
          eq1.queryExecution.executedPlan.toString)
        assert(eq1.collect().map(_.toString).toSet == windowPlain1)
      }
      // rank() = 1 must NOT rewrite: rank admits ties (see rule scaladoc)
      val rankEq1 = li.withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select("l_suppkey", "l_orderkey", "l_linenumber")
      rankEq1.collect()
      assert(!rankEq1.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"))
    } finally spark.experimental.extraOptimizations = prev
  }
}
