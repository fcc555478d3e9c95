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

  test("splitLabel partitions every row into exactly one split") {
    val labeled = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 10).as("split"))
    assert(labeled.filter(!col("split").isin("train", "heldout")).count() == 0)
    assert(labeled.count() == docs.count())
    assert(labeled.filter(col("split") === "heldout").count() > 0)
  }
}
