package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev-only: raw vs residual PQ recall at varying nProbe. */
object RecallScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cellCentroids = emb.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") / 97).cast("int").as("cell_id"),
        col("embedding").as("centroid"))
    val rawCodebook = emb
      .filter(col("vec_id") % 37 === 0 && col("vec_id") / 37 < 16)
      .select((col("vec_id") / 37).cast("int").as("cid"),
        col("embedding").as("centroid"))
    val resid = Similarity.cellResiduals(emb, cellCentroids).localCheckpoint()
    val resCodebook = resid
      .filter(col("vec_id") % 37 === 0 && col("vec_id") / 37 < 16)
      .select((col("vec_id") / 37).cast("int").as("cid"),
        col("residual").as("centroid"))
    val n1 = emb.select(avg(aggregate(col("embedding").cast("array<double>"),
      lit(0.0), (a, x) => a + x * x))).head.getDouble(0)
    val n2 = resid.select(avg(aggregate(col("residual"),
      lit(0.0), (a, x) => a + x * x))).head.getDouble(0)
    println(s"RESULT mean||v||2=$n1 mean||r||2=$n2")
    val k = 10
    def exactL2TopK(qid: Long): Set[Long] = {
      val q = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>").as("__p"))
      emb.filter(col("vec_id") =!= qid).crossJoin(broadcast(q))
        .select(col("vec_id"),
          aggregate(zip_with(col("embedding").cast("array<double>"),
            col("__p"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSet
    }
    val exacts = (1L to 10L).map(q => q -> exactL2TopK(q)).toMap
    for (np <- Seq(2, 6)) {
      var rawH = 0; var resH = 0
      for (qid <- 1L to 10L) {
        val raw = Similarity.ivfPqTopK(emb, cellCentroids, rawCodebook,
          qid, k, nProbe = np, m = 4).select("vec_id").as[Long].collect().toSet
        val res = Similarity.ivfPqResidualTopK(emb, cellCentroids, resCodebook,
          qid, k, nProbe = np, m = 4, residuals = Some(resid))
          .select("vec_id").as[Long].collect().toSet
        rawH += (raw intersect exacts(qid)).size
        resH += (res intersect exacts(qid)).size
      }
      println(s"RESULT nProbe=$np raw=$rawH res=$resH /100")
    }
  }
}
