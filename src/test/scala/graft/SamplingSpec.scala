package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  test("hash sample is deterministic and invariant under repartitioning") {
    val a = Sampling.hashSample(docs, "doc_id", 10).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 10).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("sample rate lands near the requested percent") {
    val n = docs.count().toDouble
    val s = Sampling.hashSample(docs, "doc_id", 20).count().toDouble
    assert(math.abs(s / n - 0.20) < 0.10, s"rate ${s / n}") // small-n tolerance
  }

  test("growing percent only ADDS rows (stable split boundary)") {
    val p5 = Sampling.hashSample(docs, "doc_id", 5).select("doc_id").as[Long].collect().toSet
    val p20 = Sampling.hashSample(docs, "doc_id", 20).select("doc_id").as[Long].collect().toSet
    assert(p5.subsetOf(p20))
  }

  test("Column-rate overload raises on a per-row rate outside [0, 100]") {
    // the Int overloads require() at call time; the Column overload can only
    // check per row — a silently-empty or silently-full stratum is the bug
    val bad = Sampling.hashSamplePortable(docs, "doc_id",
      when(col("lang") === "en", -5).otherwise(50))
    val e = intercept[Exception](bad.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("percent must be in [0, 100]")), e)
    // valid per-row rates still work (0 and 100 are legal boundary values)
    val ok = Sampling.hashSamplePortable(docs, "doc_id",
      when(col("lang") === "en", 0).otherwise(100))
    assert(ok.filter(col("lang") === "en").count() == 0)
    assert(ok.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
  }

  test("splitLabel partitions every row into exactly one split") {
    val labeled = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 10).as("split"))
    assert(labeled.filter(!col("split").isin("train", "heldout")).count() == 0)
    assert(labeled.count() == docs.count())
    assert(labeled.filter(col("split") === "heldout").count() > 0)
  }

  test("weighted sample favors heavy rows, is repartition-invariant, zero weight loses") {
    import spark.implicits._
    // 10 rows with weight 10000 among 500 of weight 1: every heavy key is
    // u^(1/10000) ≈ 1, so all 10 must land in a top-50 sample
    val rows = (1L to 500L).map(i => (i, if (i <= 10) 10000 else 1)) :+ (501L, 0)
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert((1L to 10L).toSet.subsetOf(a))
    assert(!a.contains(501L)) // zero weight → key 0, never ahead of positives
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(a == b) // deterministic under repartitioning
  }
}
