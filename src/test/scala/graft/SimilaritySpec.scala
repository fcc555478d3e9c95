package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite
    (4L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine column functions compute exact values") {
    val row = vecs.filter($"vec_id" === 2L)
      .select(
        dotProduct(col("embedding"), array(lit(0.0), lit(2.0), lit(0.0))).as("dot"),
        l2Norm(col("embedding")).as("n"))
      .collect().head
    assert(row.getAs[Double]("dot") == 2.0)
    assert(row.getAs[Double]("n") == 1.0)
  }

  test("brute-force top-k ranks by cosine, deterministic tiebreak") {
    val top = Similarity.cosineTopK(vecs, queryId = 0L, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 4L, 2L)) // 0.994 > 0.707 > 0.0
  }

  test("nearest neighbor per probe") {
    val nn = Similarity.nearestNeighbor(vecs, col("vec_id") < 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(nn(0L) == 1L)
    assert(nn(1L) == 0L)
  }

  test("srp bucket: same direction → same bucket, opposite → different") {
    val b = vecs.select(col("vec_id"),
      Similarity.srpBucket(col("embedding"), dim = 3, numPlanes = 16).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L)) // nearly identical direction
    assert(b(0L) != b(3L)) // antipodal: every SRP bit flips
  }

  test("bucketed top-k finds the near neighbor inside the query bucket") {
    val top = Similarity.cosineTopKBucketed(vecs, queryId = 0L, k = 3,
      dim = 3, numPlanes = 4).select("vec_id").as[Long].collect().toSeq
    assert(top.contains(1L))
    assert(!top.contains(3L))
  }

  test("IVF cell assignment picks the nearest centroid") {
    val centroids = Seq(
      (0, Array(1.0f, 0.0f, 0.0f)),
      (1, Array(0.0f, 1.0f, 0.0f))
    ).toDF("cell_id", "centroid")
    val cells = Similarity.assignCells(vecs, centroids)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(cells(0L) == 0 && cells(1L) == 0)
    assert(cells(2L) == 1)
  }
}
