package graft

import graft.io.IO
import graft.ops.{AddCountry, GeoAggregate}
import org.apache.spark.sql.functions._

/** Golden tests over the committed fixtures (FIXTURES.md §1) — hand-computed
  * expected outputs for the three reference behaviors.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = getClass.getResource("/fixtures").getPath

  test("geo_points.csv: agg median at 2.5° matches hand computation") {
    val df = IO.readFile(spark, s"$fixtures/geo_points.csv",
      Seq("Latitude", "Longitude", "Data"))
    val out = GeoAggregate(df, "median", 2.5).collect()
      .map(r => (r.getAs[Double]("Latitude"), r.getAs[Double]("Longitude")) ->
        r.getAs[Double]("Data")).toMap
    // origin cell (bins 36,72; centroid 1.25,1.25) holds Data 40,50,60,70,50
    // → /10 → {4,5,6,7,5} → median 5.0
    assert(out((1.25, 1.25)) == 5.0)
    // lone pair cell at (46.25, 91.25): {8,9} → 8.5
    assert(out((46.25, 91.25)) == 8.5)
    // out-of-range row (91,181) lands in its own overflow cell, not dropped
    // (digitize clamp semantics, SURVEY §2.2): bin 72 lat → centroid 91.25
    assert(out.contains((91.25, 181.25)))
    assert(out.size == 6)
  }

  test("typed.csv: pandas-parity inference on the committed fixture") {
    val df = IO.readCsv(spark, s"$fixtures/typed.csv")
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("int_col") == "long") // pandas int64 parity (readCsv upcast)
    assert(types("float_col") == "double")
    assert(types("maybe_num") == "string")
    assert(types("sci") == "double")
    assert(df.filter(col("str_col") === "spaced").count() == 1) // stripped
  }

  test("countries_bbox.csv drives the bbox join") {
    val boxes = IO.readCsv(spark, s"$fixtures/countries_bbox.csv")
    val pts = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, -5.0, -5.0), (4L, 50.0, 50.0))
      .toDF("id", "Latitude", "Longitude")
    val by = AddCountry(pts, boxes).select("id", "Country")
      .as[(Long, String)].collect().toMap
    assert(by == Map(1L -> "Alpha", 2L -> "Beta", 3L -> "Gamma", 4L -> AddCountry.NoCountry))
  }

  test("nested_dir: recursive discovery of the committed tree") {
    val found = IO.discoverCsvFiles(spark, s"$fixtures/nested_dir")
      .map(f => f.substring(f.lastIndexOf('/') + 1))
    assert(found.toSet == Set("x.csv", "y.CSV"))
  }
}
