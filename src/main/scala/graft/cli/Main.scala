package graft.cli

import org.apache.spark.sql.SparkSession

import graft.io.{IO, PathDerive}
import graft.ops.{AddCountry, GeoAggregate}

/** The reference's public API is three CLIs (SURVEY.md §2.9); here they are
  * three subcommands of one Spark driver:
  *
  *   graft csv2parquet <src> [dest]                       (csv2parquet.py:194-199)
  *   graft add_country <glob> [dest_suffix]               (add_country.py:201-207)
  *   graft agg <glob> [dest_suffix] [-m mode] [-s meters] [--collate]
  *                                                        (agg.py:262-272)
  *
  * Parallelism note: the reference fans a thread pool over input files
  * (X1, `csv2parquet.py:43-60`). In Spark, per-ROW parallelism is the
  * engine's job; for per-FILE output granularity (X4) we loop jobs on the
  * driver — each job is itself partition-parallel, which is strictly more
  * parallelism than the reference's one-thread-per-file.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-${args.head}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.head, args.tail)
    catch {
      case e: IllegalArgumentException =>
        System.err.println(s"error: ${e.getMessage}\n$usage"); sys.exit(2)
    } finally spark.stop()
  }

  val usage: String =
    """usage: graft <subcommand> [args]
      |  csv2parquet <src-file-or-dir> [dest]
      |  add_country <glob> [dest_suffix=_with_country]
      |  agg <glob> [dest_suffix=_geo_aggregated] [-m mean|median|max] [-s meters] [--collate]
      |""".stripMargin

  def run(spark: SparkSession, cmd: String, args: Array[String]): Unit = cmd match {
    case "csv2parquet" => csv2parquet(spark, args)
    case "add_country" => addCountry(spark, args)
    case "agg" => agg(spark, args)
    case other => throw new IllegalArgumentException(s"unknown subcommand: $other")
  }

  /** `csv2parquet src [dest]`: file → file; dir → recursive discovery with
    * mirrored basenames (`csv2parquet.py:125-133`).
    */
  private def debugFlag(args: Array[String]): Boolean =
    args.contains("-d") || args.contains("--debug")

  def csv2parquet(spark: SparkSession, args: Array[String]): Unit =
    withLog(new CliLog("csv2parquet", debugFlag(args))) { log =>
    val pos = args.filterNot(_.startsWith("-"))
    require(pos.nonEmpty, "csv2parquet needs a src argument")
    val src = pos(0)
    val dest = if (pos.length > 1) pos(1) else ""
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(new org.apache.hadoop.fs.Path(src)).isDirectory) {
      val files = IO.discoverCsvFiles(spark, src)
      // deviation from csv2parquet.py:89-90, which logs this error even on
      // success: we log it only when the glob is actually empty
      if (files.isEmpty) log.error("no CSV files found")
      files.foreach { f =>
        val d =
          if (dest.isEmpty) PathDerive.csvToParquetDest(f, "")
          else PathDerive.csvToParquetDest(f, dest.stripSuffix("/") + "/")
        log.debug(s"csv_file: $f -> $d")
        IO.writeSingleFile(IO.readCsv(spark, f), d, IO.ParquetExt)
      }
      log.info(s"converted ${files.length} file(s) under $src")
    } else {
      val d = PathDerive.csvToParquetDest(src, dest)
      log.debug(s"csv_file: $src -> $d")
      IO.writeSingleFile(IO.readCsv(spark, src), d, IO.ParquetExt)
      log.info(s"converted $src")
    }
  }

  /** Run `body` with a CliLog, releasing its file handle afterwards (one
    * logger per invocation — without the close every run leaks an fd).
    */
  private def withLog(log: CliLog)(body: CliLog => Unit): Unit =
    try body(log) finally log.close()

  /** `add_country glob [suffix]` (default `_with_country`,
    * `add_country.py:28`): per input file, enrich with Country via the
    * broadcast bbox join and write back in the SAME format (S10).
    */
  def addCountry(spark: SparkSession, args: Array[String]): Unit =
    withLog(new CliLog("add_country", debugFlag(args))) { log =>
    val pos = args.filterNot(_.startsWith("-"))
    require(pos.nonEmpty, "add_country needs a glob argument")
    val suffix = if (pos.length > 1) pos(1) else "_with_country"
    val boxes = AddCountry.boxesDf(spark)
    val files = IO.globFiles(spark, pos(0))
    for (f <- files) {
      val dest = PathDerive.addSuffix(f, suffix)
      log.debug(s"data_file: $f -> $dest")
      val out = AddCountry(IO.readFile(spark, f), boxes)
      IO.writeFile(out, dest)
    }
    log.info(s"enriched ${files.length} file(s) matching ${pos(0)}")
  }

  /** `agg glob [suffix] [-m mode] [-s meters] [--collate]` (`agg.py:262-272`;
    * defaults: suffix `_geo_aggregated` agg.py:29, mode `median`
    * agg.py:265-266, size 10 m agg.py:267-268). Output is ALWAYS Parquet —
    * reference quirk preserved (`agg.py:171-172`). Collate mode is one
    * multi-path read + one aggregation (X3, Spark's default shape);
    * per-file mode loops one job per input (X4).
    */
  def agg(spark: SparkSession, args: Array[String]): Unit = {
    var mode = "median"
    var meters = 10.0
    var collate = false
    val pos = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-m" | "--mode" => mode = args(i + 1); i += 2
        case "-s" | "--size" => meters = args(i + 1).toDouble; i += 2
        case "--collate" => collate = true; i += 1
        case "-d" | "--debug" => i += 1
        case a => pos += a; i += 1
      }
    }
    require(pos.nonEmpty, "agg needs a glob argument")
    require(GeoAggregate.modes.contains(mode.toLowerCase(java.util.Locale.ROOT)),
      s"mode must be one of ${GeoAggregate.modes.keys.mkString("|")}") // agg.py:287
    require(meters >= 0, "grid size must be >= 0") // agg.py:291
    withLog(new CliLog("agg", debugFlag(args))) { log =>
    val suffix = if (pos.length > 1) pos(1) else "_geo_aggregated"
    val files = IO.globFiles(spark, pos(0))
    val step = GeoAggregate.metersToDegrees(meters)
    log.debug(s"mode=$mode size_m=$meters step_deg=$step collate=$collate " +
      s"files=${files.length}")
    if (collate) {
      // one multi-path read → one aggregate → one output (agg.py:174-193)
      val cols = Seq("Latitude", "Longitude", "Data")
      val dfs = files.map(f => IO.readFile(spark, f, cols))
      require(dfs.nonEmpty, s"no files matched ${pos(0)}")
      val all = dfs.reduce(_ unionByName _)
      IO.writeSingleFile(
        GeoAggregate(all, mode, step), s"$suffix.parquet", IO.ParquetExt) // agg.py:169
      log.info(s"collated ${files.length} file(s) -> $suffix.parquet")
    } else {
      for (f <- files) {
        val dest = PathDerive.addSuffix(f, suffix).replaceAll("\\.[^./]+$", ".parquet")
        log.debug(s"data_file: $f -> $dest")
        val out = GeoAggregate(IO.readFile(spark, f, Seq("Latitude", "Longitude", "Data")),
          mode, step)
        // always parquet, even for CSV input (agg.py:171-172)
        IO.writeSingleFile(out, dest, IO.ParquetExt)
      }
      log.info(s"aggregated ${files.length} file(s) matching ${pos(0)}")
    }
    }
  }
}
