package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Bench {
  /** Checksum-consuming action: aggregate a hash of EVERY output column over
    * EVERY row. A bare `count()` lets Catalyst prune all columns and collapse
    * projection-only queries (q02) to a metadata/count-only scan, flattering
    * the engine; hashing a struct of all columns forces full materialization
    * while still returning one row to the driver. The fold is bit_xor, NOT
    * sum: uniform 64-bit hashes overflow a Long sum within a few dozen rows
    * and Spark 4's default ANSI mode turns that into ARITHMETIC_OVERFLOW —
    * which would abort row-heavy queries mid-execution and silently
    * under-measure them (xor is overflow-free and order-insensitive).
    */
  private def consume(df: DataFrame): Unit =
    df.agg(count(lit(1)),
      expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`${c.replace("`", "``")}`").mkString(", ")}))"))
      .collect()

  /** Time one query `reps` times and report the MEDIAN — one-rep timings
    * cannot distinguish a real regression from shared-session noise (the
    * round-6 steady>fresh anomaly was unattributable for exactly that
    * reason). After EVERY rep, blocks persisted by the query (eager
    * localCheckpoints inside iterative/multi-consumer operators) are
    * explicitly unpersisted: without the release, ~250 query executions
    * accumulate dead checkpoint blocks that compete with execution memory
    * and bleed into later queries' times. Bench runs queries one at a
    * time, so the persistent-id diff cannot race with another query.
    */
  private def timeOne(spark: SparkSession, sfDir: String,
                      fn: (SparkSession, String) => DataFrame,
                      reps: Int): Double = {
    val times = (1 to reps).map { _ =>
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val t0 = System.nanoTime()
      // no swallowed exceptions: a failing query must fail the bench run
      // loudly rather than record a partial-execution time
      consume(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      t
    }.sorted
    times(times.size / 2)
  }

  private def timeAll(spark: SparkSession, sfDir: String,
                      reps: Int): Map[String, Double] =
    // sorted-name order, NOT HashMap order: q104 installs the top-k rewrite
    // into the shared session mid-run, so which queries execute pre- vs
    // post-install must stay stable round over round — hash order would
    // reshuffle it whenever the key set changes and turn plan-shape
    // differences into phantom per-query regressions in BENCH_DETAIL.json
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> timeOne(spark, sfDir, fn, reps)
    }.toMap

  /** Storage snapshot: (persistent RDD count, their total memory bytes) —
    * recorded between passes so a steady-pass regression is attributable
    * (block accumulation vs codegen cache vs GC) instead of a mystery.
    */
  private def storageSnapshot(spark: SparkSession): (Int, Long) = {
    val rdds = spark.sparkContext.getPersistentRDDs.values.toSeq
    val bytes = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    (rdds.size, bytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val steadyReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC") // same session as Verify
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet reader, broadcast machinery) so the
    // first timed query doesn't absorb ~4s of one-time JVM/session startup
    SparkEntry.entry(spark).count()
    // pass 1 = fresh (includes per-plan codegen/analysis, single rep — the
    // first execution of a plan is by definition unrepeatable); pass 2 =
    // steady state (plan+codegen caches warm), MEDIAN of `steadyReps` — the
    // number that tracks actual execution cost. Headline metric stays the
    // fresh total for cross-round comparability.
    val fresh = timeAll(spark, sfDir, reps = 1)
    val (rddsAfterFresh, bytesAfterFresh) = storageSnapshot(spark)
    val steady = timeAll(spark, sfDir, reps = steadyReps)
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (fresh.nonEmpty) fresh.values.sum else 0.0
    val steadyTotal = if (steady.nonEmpty) steady.values.sum else 0.0
    // the driver's log capture truncates the one-line JSON tail, losing
    // ~half the per-query times — ALSO write the complete artifact to a
    // committed file so round-over-round regressions stay adjudicable
    val detail = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val detailJson = new StringBuilder()
      .append(s"""{"sf":"$sfDir","n_queries":${fresh.size},""")
      .append(s""""fresh_total":$total,"steady_total":$steadyTotal,""")
      .append(s""""steady_reps":$steadyReps,""")
      .append(s""""persistent_rdds_after_fresh":$rddsAfterFresh,""")
      .append(s""""persisted_bytes_after_fresh":$bytesAfterFresh,""")
      .append("\"fresh\":{")
      .append(fresh.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"steady\":{")
      .append(steady.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("}}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detail),
      detailJson.toString)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(fresh)},"steady_total":$steadyTotal,"queries_steady":${js(steady)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
