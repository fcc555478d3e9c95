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

  /** Time ONE execution of one query. After the run, blocks persisted by
    * the query (eager localCheckpoints inside iterative/multi-consumer
    * operators) are explicitly unpersisted: without the release, ~750
    * query executions accumulate dead checkpoint blocks that compete with
    * execution memory and bleed into later queries' times. Bench runs
    * queries one at a time, so the persistent-id diff cannot race with
    * another query.
    */
  private def timeOnce(spark: SparkSession, sfDir: String,
                       fn: (SparkSession, String) => DataFrame): Double = {
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
  }

  /** Storage snapshot: (persistent RDD count, their total memory bytes) —
    * recorded between passes so a steady-pass regression is attributable
    * (block accumulation vs codegen cache vs GC) instead of a mystery.
    */
  private def storageSnapshot(spark: SparkSession): (Int, Long) = {
    val rdds = spark.sparkContext.getPersistentRDDs.values.toSeq
    val bytes = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    (rdds.size, bytes)
  }

  /** SELF-ADJUDICATING measurement protocol (the round-7 lesson: a
    * machine-contention window during back-to-back reps of one query
    * masqueraded as a 55× per-query regression, and proving it required
    * diffing two whole runs):
    *
    *   - pass 1 = FRESH, one rep per query in stable sorted-name order
    *     (q104 installs the top-k rewrite session-wide mid-run; its
    *     install point must stay fixed round over round or plan-shape
    *     differences become phantom regressions). Fresh includes
    *     per-plan analysis/codegen — by definition unrepeatable.
    *   - passes 2..(steadyReps+1) = STEADY: each is a FULL-SUITE pass in
    *     a per-rep deterministic rotation (MurmurHash3(name, rep) order —
    *     same orders every round). A query's reps are therefore
    *     temporally separated and differently ordered, so a sustained
    *     contention window inflates one PASS (visible in
    *     steady_pass_totals and as one outlier in the per-query rep
    *     array), never all reps of one query. All steady passes run
    *     post-rewrite-install, so order rotation cannot change plans.
    *
    * Lanes in BENCH_DETAIL.json: `steady` = per-query MEDIAN of reps
    * (the round-over-round comparison lane — keep comparing THIS one),
    * `steady_min` = per-query MIN (the contention-immune floor: compare
    * it when median moved but min didn't — that's noise, not
    * regression), `steady_rep_times` = the raw per-rep arrays,
    * `steady_pass_totals` = per-pass wall totals (a contention window
    * shows here as one inflated pass). `fresh` stays the headline for
    * cross-round comparability.
    *
    * FRESH is also multi-rep (r12 verdict: one cold run per round left
    * fresh deltas unadjudicable — two builder runs bracketed ±8%):
    * rep 1 is the original cold-JVM pass and REMAINS the `fresh`
    * headline (comparable to every earlier round); reps 2..freshReps
    * each STOP the SparkSession and rebuild it, so all session-scoped
    * state (catalog, RuntimeConfig ensure* caches, persisted blocks)
    * rebuilds from scratch — cold SESSION, warm JVM (the static codegen
    * cache survives, deliberately documented rather than pretended
    * away). `fresh_median`/`fresh_min`/`fresh_pass_totals`/
    * `fresh_rep_times` let a later round tell one noisy cold pass from
    * a real fresh-lane regression without rerunning anything.
    */
  /** Self-contained measurement (r17): the fingerprint-keyed shared
    * relations under /tmp/graft_* persist across PROCESSES, so a second
    * bench run (or a lower-core scaling run) would probe parquet built by
    * an earlier run instead of paying the build — steady lanes then
    * measure probe cost, not compute cost, and core-scaling ratios come
    * out < 1. Wiping once at main start makes every run pay each build
    * exactly once; within-run reuse (fresh builds, steady probes) is the
    * declared incremental semantics and is unchanged.
    */
  private def wipeCrossRunRelations(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete()
    }
    // DIRECTORIES only: every engine-owned shared relation is a parquet
    // directory; a plain /tmp/graft_* FILE belongs to someone else (the
    // driver parks its own graft_-prefixed files in /tmp) and must
    // survive the wipe
    Option(new java.io.File("/tmp").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft_"))
      .foreach(rm)
  }

  def main(args: Array[String]): Unit = {
    wipeCrossRunRelations()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val steadyReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val freshReps = sys.env.getOrElse("SPARK_GRAFT_FRESH_REPS", "3").toInt
    def buildSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC") // same session as Verify
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // warm the session (codegen, parquet reader, broadcast machinery) so
      // the first timed query doesn't absorb ~4s of one-time startup
      SparkEntry.entry(s).count()
      s
    }
    var spark = buildSession()
    val order = SparkEntry.queries.toSeq.sortBy(_._1)
    val freshPasses: Seq[Seq[(String, Double)]] = (1 to freshReps).map { rep =>
      if (rep > 1) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = buildSession()
      }
      order.map { case (n, fn) => n -> timeOnce(spark, sfDir, fn) }
    }
    val fresh = freshPasses.head.toMap // rep 1 = cold JVM, the headline
    val freshPassTotals = freshPasses.map(_.map(_._2).sum)
    val freshRepTimes: Map[String, Seq[Double]] =
      order.map { case (n, _) => n -> freshPasses.map(_.toMap.apply(n)) }.toMap
    val freshMedian = freshRepTimes.map { case (n, ts) =>
      n -> ts.sorted.apply(ts.size / 2) }
    val freshMin = freshRepTimes.map { case (n, ts) => n -> ts.min }
    val (rddsAfterFresh, bytesAfterFresh) = storageSnapshot(spark)
    // steady passes, each full-suite in its own deterministic rotation
    val passes: Seq[Seq[(String, Double)]] = (1 to steadyReps).map { rep =>
      order.sortBy { case (n, _) =>
        scala.util.hashing.MurmurHash3.stringHash(n, rep)
      }.map { case (n, fn) => n -> timeOnce(spark, sfDir, fn) }
    }
    val passTotals = passes.map(_.map(_._2).sum)
    // per-query rep vectors in REP order (pass 1..N), not execution order
    val repTimes: Map[String, Seq[Double]] =
      order.map { case (n, _) => n -> passes.map(_.toMap.apply(n)) }.toMap
    val steady = repTimes.map { case (n, ts) =>
      n -> ts.sorted.apply(ts.size / 2) }
    val steadyMin = repTimes.map { case (n, ts) => n -> ts.min }
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (fresh.nonEmpty) fresh.values.sum else 0.0
    val steadyTotal = if (steady.nonEmpty) steady.values.sum else 0.0
    val steadyMinTotal = if (steadyMin.nonEmpty) steadyMin.values.sum else 0.0
    // the driver's log capture truncates the one-line JSON tail, losing
    // ~half the per-query times — ALSO write the complete artifact to a
    // committed file so round-over-round regressions stay adjudicable
    val detail = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val detailJson = new StringBuilder()
      .append(s"""{"sf":"$sfDir","n_queries":${fresh.size},""")
      .append(s""""fresh_total":$total,"steady_total":$steadyTotal,""")
      .append(s""""steady_min_total":$steadyMinTotal,""")
      .append(s""""steady_reps":$steadyReps,""")
      .append(s""""steady_pass_totals":[${passTotals.mkString(",")}],""")
      .append(s""""fresh_reps":$freshReps,""")
      .append(s""""fresh_pass_totals":[${freshPassTotals.mkString(",")}],""")
      .append(s""""fresh_median_total":${freshMedian.values.sum},""")
      .append(s""""fresh_min_total":${freshMin.values.sum},""")
      .append(s""""fresh_lane_note":"fresh = rep 1 only (cold JVM, comparable to earlier rounds); reps 2+ rebuild the SparkSession (cold session, warm JVM codegen cache). Adjudicate fresh deltas on fresh_median vs fresh_min before believing rep-1 noise.",""")
      .append(s""""compare_lane":"steady (median); if it moved but steady_min did not, adjudicate as contention noise",""")
      .append(s""""persistent_rdds_after_fresh":$rddsAfterFresh,""")
      .append(s""""persisted_bytes_after_fresh":$bytesAfterFresh,""")
      .append("\"fresh\":{")
      .append(fresh.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"fresh_median\":{")
      .append(freshMedian.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"fresh_min\":{")
      .append(freshMin.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"fresh_rep_times\":{")
      .append(freshRepTimes.toSeq.sortBy(_._1)
        .map { case (k, ts) => s"\"$k\":[${ts.mkString(",")}]" }
        .mkString(",\n"))
      .append("},\n\"steady\":{")
      .append(steady.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"steady_min\":{")
      .append(steadyMin.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString(",\n"))
      .append("},\n\"steady_rep_times\":{")
      .append(repTimes.toSeq.sortBy(_._1)
        .map { case (k, ts) => s"\"$k\":[${ts.mkString(",")}]" }
        .mkString(",\n"))
      .append("}}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detail),
      detailJson.toString)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(fresh)},"steady_total":$steadyTotal,"queries_steady":${js(steady)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
