package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.GeoAggregate

class GeoAggregateSpec extends SparkSpec {

  /** Manual property harness (the scalatest-scalacheck bridge isn't in the
    * offline cache): deterministic sampling of a Gen.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 500)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  import spark.implicits._

  /** Reimplementation of numpy.digitize(x, arange(lo, hi, step)) - 1 with
    * the arange's accumulated-step edges (`agg.py:131-132,149-151`), for
    * property-testing the closed-form floor bin.
    */
  private def referenceDigitize(x: Double, lo: Double, hi: Double, step: Double): Long = {
    val n = math.ceil((hi - lo) / step).toLong
    val edges = (0L until n).map(i => lo + i * step)
    // digitize(right=False): index of first edge > x; minus 1
    (edges.indexWhere(e => e > x) match {
      case -1 => n
      case i => i.toLong
    }) - 1L
  }

  test("meters to degrees matches the reference constant formula") {
    // agg.py:87-94 with EARTH_RADIUS_IN_METERS = 6371000
    assert(math.abs(GeoAggregate.metersToDegrees(10.0) - 8.993216059187306e-5) < 1e-18)
    assert(GeoAggregate.metersToDegrees(0.0) == 0.0)
    assertThrows[IllegalArgumentException](GeoAggregate.metersToDegrees(-1.0))
  }

  test("closed-form floor bin matches digitize for lat range, incl. edges") {
    val step = 2.5
    val interesting = Seq(-90.0, -87.5, -0.0, 0.0, 2.4999999, 2.5, 89.999, 87.5)
    forAllSampled(Gen.oneOf(Gen.choose(-90.0, 89.999), Gen.oneOf(interesting))) { lat =>
      val expected = referenceDigitize(lat, -90, 90, step)
      val got = math.floor((lat - -90.0) / step).toLong
      assert(got == expected, s"lat=$lat")
    }
  }

  test("out-of-range semantics: below lo → -1, at/above hi → last bin") {
    val step = 2.5
    assert(math.floor((-90.1 + 90.0) / step).toLong == -1L)
    assert(math.floor((90.0 + 90.0) / step).toLong == 72L) // == n bins
  }

  test("pipeline: median default on a hand-computed grid") {
    // two cells; cell A has 4 values (even count → interpolated median)
    val df = Seq(
      (1.0, 1.0, 10.0), (1.2, 1.1, 20.0), (1.3, 1.4, 30.0), (2.0, 2.0, 40.0),
      (50.0, 50.0, 70.0)) // lone point in another cell
      .toDF("Latitude", "Longitude", "Data")
    val out = GeoAggregate(df, "median", stepDegrees = 2.5)
      .orderBy("Latitude").collect()
    assert(out.length == 2)
    // values /10 → cell A = {1,2,3,4} → median 2.5; centroid of bin (36,72)
    val a = out(0)
    assert(a.getAs[Double]("Data") == 2.5)
    assert(a.getAs[Double]("Latitude") == (36 * 2.5 - 90 + 1.25))
    assert(a.getAs[Double]("Longitude") == (72 * 2.5 - 180 + 1.25))
    val b = out(1)
    assert(b.getAs[Double]("Data") == 7.0)
  }

  test("mean and max modes; unknown mode rejected") {
    val df = Seq((0.0, 0.0, 10.0), (0.1, 0.1, 30.0)).toDF("Latitude", "Longitude", "Data")
    assert(GeoAggregate(df, "mean", 2.5).collect().head.getAs[Double]("Data") == 2.0)
    assert(GeoAggregate(df, "max", 2.5).collect().head.getAs[Double]("Data") == 3.0)
    assertThrows[IllegalArgumentException](GeoAggregate(df, "sum", 2.5))
  }

  test("collate invariance for mean/max: aggregate(union) == expected") {
    val part1 = Seq((0.0, 0.0, 10.0), (0.1, 0.1, 20.0)).toDF("Latitude", "Longitude", "Data")
    val part2 = Seq((0.2, 0.2, 60.0)).toDF("Latitude", "Longitude", "Data")
    val collated = GeoAggregate(part1.unionByName(part2), "mean", 2.5).collect().head
    assert(collated.getAs[Double]("Data") == 3.0) // (1+2+6)/3
  }
}
