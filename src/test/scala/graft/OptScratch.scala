package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only optimization harness (round 16): for each named query, time
  * N reps with the EXACT bench consume action (hash-all-columns aggregate,
  * same as graft.Bench) in a bench-shaped session, and optionally dump
  * `explain("formatted")` to plans/r16/<query>_<tag>.txt.
  *
  *   sbt "Test/runMain graft.OptScratch [--plans TAG] q246_kcore_customers ..."
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_OPT_REPS (default 3).
  */
object OptScratch {
  private def consume(df: DataFrame): Unit =
    df.agg(count(lit(1)),
      expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`${c.replace("`", "``")}`").mkString(", ")}))"))
      .collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_OPT_REPS", "3").toInt
    val (planTag, names0) = args.toSeq match {
      case Seq("--plans", tag, rest @ _*) => (Some(tag), rest)
      case rest                            => (None, rest)
    }
    val names = if (names0.nonEmpty) names0 else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // warm, same as Bench
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      planTag.foreach { tag =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        val dir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
          "plans/r17"))
        Files.createDirectories(dir)
        Files.writeString(dir.resolve(s"${name}_$tag.txt"), txt)
      }
      val ts = (1 to reps).map { rep =>
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val t0 = System.nanoTime()
        consume(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        t
      }
      println(f"[opt] $name%-34s min ${ts.min}%7.3f  reps ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
