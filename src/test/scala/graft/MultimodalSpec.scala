package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesize(
    spark, Tables.documents(spark, sf0001).select("doc_id"), "doc_id")

  test("synthesized media matches the declared schema shape") {
    assert(media.columns.toSeq == Seq("media_id", "kind", "content", "meta"))
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("expression-level decode stub emits bounded features per row") {
    val out = Multimodal.decodeStub(media)
    assert(out.count() == media.count())
    val feats = out.select("features").as[Seq[Double]].collect()
    assert(feats.forall(f => f.length == 8 && f.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("partition-wise decode is deterministic and preserves cardinality") {
    val a = Multimodal.decodePartitionwise(media)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    val b = Multimodal.decodePartitionwise(media.repartition(7))
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(a.size == media.count())
    assert(a == b) // partitioning must not change per-row results
    assert(a.values.forall(_.length == 8))
  }
}
