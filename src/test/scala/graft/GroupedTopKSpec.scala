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
}
