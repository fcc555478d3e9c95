package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("clusterNearDups: components converge to min-id labels") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val got = Dedup.clusterNearDups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusterNearDups handles a long chain within maxIter") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusterNearDups(chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L))
  }

  test("ivfTopK: probing the right cells finds the brute-force neighbors") {
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = emb.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") / 97).cast("int").as("cell_id"),
        col("embedding").as("centroid"))
    val approx = Similarity.ivfTopK(emb, centroids, queryId = 1L, k = 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.cosineTopK(emb, queryId = 1L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    // approximate: require meaningful overlap with the exact answer
    assert(approx.size == 10)
    assert((approx intersect exact).size >= 3,
      s"recall too low: approx=$approx exact=$exact")
  }
}
