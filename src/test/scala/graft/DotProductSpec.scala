package graft

import org.apache.spark.sql.functions._

import graft.functions.{dotProduct, DotProduct}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches hand-computed values (double + float inputs)") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
    ).toDF("a", "b")
    val got = df.select(dotProduct(col("a"), col("b")).as("d")).as[Double].collect()
    assert(got.toSeq == Seq(32.0, 0.0))
    val floats = Seq((Array(1.5f, 2.0f), Array(2.0f, 3.0f))).toDF("a", "b")
    assert(floats.select(dotProduct(col("a"), col("b"))).as[Double].collect().head == 9.0)
  }

  test("null array → null; null elements contribute zero") {
    val df = Seq(
      (Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(5.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val got = df.select(dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(14.0), None))
  }

  test("agrees with the HOF formulation on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
      .select(col("embedding").cast("array<double>").as("e"))
    val hof = aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(abs(dotProduct(col("e"), col("e")) - hof).as("d"))
      .agg(max(col("d"))).as[Double].collect().head
    assert(diff == 0.0) // same in-order accumulation → bit-identical
  }

  test("SQL registration (as GraftExtensions would inject)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    val got = spark.sql(
      "SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>), CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d")
      .as[Double].collect().head
    assert(got == 11.0)
  }

  test("sortedIntersectCount: duplicates, disjoint, empty, agrees with array_intersect") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 2),
      (Seq(1L, 1L, 2L, 2L), Seq(1L, 2L, 2L), 2), // duplicates count once
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq.empty[Long], Seq(1L), 0)
    ).toDF("a", "b", "expected")
    val rows = df.select(
      graft.functions.sortedIntersectCount(col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).as("builtin"),
      col("expected")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(2))
      assert(r.getInt(0) == r.getInt(1)) // matches Spark's set semantics
    }
  }

  test("type check rejects non-double arrays with a helpful message") {
    val bad = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      bad.select(ColumnBridge.column(DotProduct(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))).collect()
    }
    assert(e.getMessage.contains("array<double>") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("matVec equals the composed array-of-dotProducts bit for bit") {
    val rnd = new scala.util.Random(7)
    val m = Seq.fill(5)(Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val data = Seq.fill(20)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val composed = data.select(col("id"),
      array(m.map(row => graft.functions.dotProduct(col("v"),
        array(row.map(lit): _*))): _*).as("out"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    val native = data.select(col("id"),
      graft.functions.matVec(col("v"), m).as("out"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    // bit-identical, not approximately equal: same fold order per row
    assert(native.zip(composed).forall { case (a, b) => a == b })
  }

  test("matVec: short input zero-extends; null elements contribute 0; null array → null") {
    val m = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(1.0)))),            // short: third term 0
      (2L, Some(Seq(Some(1.0), None, Some(1.0)))),      // null elem skipped
      (3L, None: Option[Seq[Option[Double]]])           // null array
    ).toDF("id", "v")
    val got = df.select(col("id"), graft.functions.matVec(col("v"), m).as("o"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Double](1) == Seq(3.0, 9.0))
    assert(got(1).getSeq[Double](1) == Seq(4.0, 10.0))
    assert(got(2).isNullAt(1))
  }
}
