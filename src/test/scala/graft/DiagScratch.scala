package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions._

/** Dev-only: stage-by-stage timing of the minhash pipeline. */
object DiagScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSpec.session
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    time("docs.count")(println("docs=" + docs.count()))
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 2, 64)
    time("signatures")(sigs.count())
    val sigsC = sigs.cache()
    time("signatures cached")(sigsC.count())
    val cands = Dedup.lshCandidates(sigsC, "doc_id", 8, 8)
    time("candidates")(println("cands=" + cands.count()))
    val candsC = cands.cache()
    time("candidates cached")(candsC.count())
    val sh = docs.select(col("doc_id"),
      array_distinct(transform(wordShingles(col("text"), 2), xxhash64(_))).as("__sh"))
      .withColumn("__n", size(col("__sh"))).cache()
    time("shingles cached")(sh.count())
    val joined = candsC
      .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("sh_a"), col("__n").as("n_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("sh_b"), col("__n").as("n_b")), "id_b")
    time("join only")(println("joined=" + joined.count()))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val verified = joined.select(col("id_a"), col("id_b"),
        (inter / ((col("n_a") + col("n_b")).cast("double") - inter)).as("j"))
      .filter(col("j") >= 0.8)
    time("verify join")(println("verified=" + verified.count()))
    time("full pipeline")(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", 2, 64, 8, 0.8).count())
    spark.stop()
  }
}
