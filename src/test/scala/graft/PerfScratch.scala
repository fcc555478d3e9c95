package graft

/** Dev-only micro-harness: time selected queries repeatedly in one JVM.
  * Run: sbt "Test/runMain graft.PerfScratch q25_langid_counts q26_minhash_sigs"
  */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSpec.session
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warm
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name%-26s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    spark.stop()
  }
}
