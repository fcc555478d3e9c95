package graft

import java.nio.file.{Files, Paths}

import graft.cli.Main

class CliSpec extends SparkSpec {

  private def tmpDir(): String = Files.createTempDirectory("graft_cli").toString

  private def writeText(path: String, content: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), content)
  }

  private val geoCsv =
    """Latitude,Longitude,Data,Extra
      |1.0,1.0,10.0,x
      |1.2,1.1,20.0,y
      |50.0,50.0,70.0,z
      |""".stripMargin

  test("csv2parquet: single file → sibling parquet") {
    val dir = tmpDir()
    writeText(s"$dir/pts.csv", geoCsv)
    Main.run(spark, "csv2parquet", Array(s"$dir/pts.csv"))
    val back = spark.read.parquet(s"$dir/pts.parquet")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("Latitude", "Longitude", "Data", "Extra"))
  }

  test("csv2parquet: directory → recursive mirrored outputs") {
    val dir = tmpDir()
    writeText(s"$dir/in/a.csv", "x\n1\n")
    writeText(s"$dir/in/sub/b.CSV", "x\n2\n")
    Main.run(spark, "csv2parquet", Array(s"$dir/in"))
    assert(Files.isRegularFile(Paths.get(s"$dir/in/a.parquet")))
    assert(Files.isRegularFile(Paths.get(s"$dir/in/sub/b.parquet")))
  }

  test("agg: per-file mode writes suffixed parquet with median default") {
    val dir = tmpDir()
    writeText(s"$dir/pts.csv", geoCsv)
    // -s in meters; use a size that gives a 2.5°-scale grid (~278 km)
    Main.run(spark, "agg", Array(s"$dir/pts.csv", "_geo_aggregated", "-s", "278000"))
    val out = spark.read.parquet(s"$dir/pts_geo_aggregated.parquet")
    assert(out.columns.toSet == Set("Latitude", "Longitude", "Data"))
    assert(out.count() == 2) // two occupied cells
  }

  test("agg: collate mode unions files into one output") {
    val dir = tmpDir()
    writeText(s"$dir/p1.csv", "Latitude,Longitude,Data\n1.0,1.0,10.0\n")
    writeText(s"$dir/p2.csv", "Latitude,Longitude,Data\n1.1,1.1,30.0\n")
    val outBase = s"$dir/collated"
    Main.run(spark, "agg", Array(s"$dir/p*.csv", outBase, "-m", "mean", "-s", "278000", "--collate"))
    val out = spark.read.parquet(s"$outBase.parquet")
    assert(out.count() == 1)
    assert(out.collect().head.getAs[Double]("Data") == 2.0) // (1+3)/2
  }

  test("agg: invalid mode rejected like agg.py:287") {
    val dir = tmpDir()
    writeText(s"$dir/pts.csv", geoCsv)
    assertThrows[IllegalArgumentException](
      Main.run(spark, "agg", Array(s"$dir/pts.csv", "-m", "sum")))
  }

  test("-d toggles debug logging; <prog>.log file handler written either way") {
    val dir = tmpDir()
    val prevLogDir = sys.props.get("graft.log.dir")
    sys.props("graft.log.dir") = dir
    try {
      writeText(s"$dir/pts.csv", geoCsv)
      Main.run(spark, "agg", Array(s"$dir/pts.csv", "-s", "278000"))
      val quiet = Files.readString(Paths.get(s"$dir/agg.log"))
      assert(quiet.contains(" INFO agg:"), quiet)
      assert(!quiet.contains(" DEBUG agg:"), quiet)
      Main.run(spark, "agg", Array(s"$dir/pts.csv", "-d", "-s", "278000"))
      val verbose = Files.readString(Paths.get(s"$dir/agg.log"))
      assert(verbose.contains(" DEBUG agg:"), verbose)
      assert(verbose.contains("data_file:"), verbose)
    } finally prevLogDir match {
      case Some(v) => sys.props("graft.log.dir") = v
      case None => sys.props.remove("graft.log.dir")
    }
  }

  test("add_country: same-format write-back with suffix") {
    val dir = tmpDir()
    writeText(s"$dir/pts.csv", geoCsv)
    Main.run(spark, "add_country", Array(s"$dir/pts.csv"))
    val out = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/pts_with_country.csv")
    assert(out.columns.contains("Country"))
    assert(out.count() == 3)
  }
}
