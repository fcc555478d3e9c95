package graft

import graft.ops.AddCountry

class AddCountrySpec extends SparkSpec {
  import spark.implicits._

  test("bbox join labels contained points; ocean → No country; 1:1 rows") {
    val pts = Seq(
      (1L, 40.0, -100.0), // United States box
      (2L, 48.0, 10.0), // Europe box
      (3L, 0.0, -140.0), // pacific ocean — unmatched
      (4L, -25.0, 135.0) // Australia box
    ).toDF("id", "Latitude", "Longitude")
    val out = AddCountry(pts, AddCountry.boxesDf(spark))
    assert(out.count() == 4) // disjoint boxes ⇒ no row duplication
    val by = out.select("id", "Country").as[(Long, String)].collect().toMap
    assert(by(1L) == "United States")
    assert(by(2L) == "Europe")
    assert(by(3L) == AddCountry.NoCountry)
    assert(by(4L) == "Australia")
  }

  test("interval semantics: min edge inclusive, max edge exclusive") {
    val pts = Seq((1L, 25.0, -100.0), (2L, 49.0, -100.0)).toDF("id", "Latitude", "Longitude")
    val by = AddCountry(pts, AddCountry.boxesDf(spark))
      .select("id", "Country").as[(Long, String)].collect().toMap
    assert(by(1L) == "United States") // lat_min inclusive
    assert(by(2L) == "Canada") // lat_max exclusive → falls into Canada's [49,72)
  }

  test("grid-indexed variant agrees with the nested-loop join on every cell") {
    // points across box interiors, boundaries, and the ocean
    val pts = (for {
      lat <- -85 to 85 by 17
      lon <- -175 to 175 by 23
    } yield (lat.toDouble * 1000 + lon, lat.toDouble, lon.toDouble))
      .toDF("id", "Latitude", "Longitude")
    val viaBnlj = AddCountry(pts, AddCountry.boxesDf(spark))
      .select("id", "Country").as[(Double, String)].collect().toMap
    val viaGrid = AddCountry.viaGridIndex(pts, AddCountry.defaultBoxes)
      .select("id", "Country").as[(Double, String)].collect().toMap
    assert(viaGrid == viaBnlj)
    assert(viaGrid.values.toSet.size > 3) // several countries + No country hit
  }

  test("grid-indexed join is an equi (hash) join, not a nested loop") {
    val pts = Seq((1L, 40.0, -100.0)).toDF("id", "Latitude", "Longitude")
    val plan = AddCountry.viaGridIndex(pts, AddCountry.defaultBoxes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlapping boxes are rejected at construction") {
    val bad = Seq(
      AddCountry.Bbox("A", 0, 10, 0, 10),
      AddCountry.Bbox("B", 5, 15, 5, 15))
    assertThrows[IllegalArgumentException](AddCountry.requireDisjoint(bad))
  }

  test("resolver-UDF parity tier: exceptions → No country (add_country.py:120-124)") {
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0)).toDF("id", "Latitude", "Longitude")
    val out = AddCountry.withResolver(pts, (lat, _) =>
      if (lat > 1.5) throw new RuntimeException("geocoder down") else "Atlantis")
    val by = out.select("id", "Country").as[(Long, String)].collect().toMap
    assert(by(1L) == "Atlantis")
    assert(by(2L) == AddCountry.NoCountry)
  }
}
