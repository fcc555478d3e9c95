package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Country enrichment — replaces the reference's per-row network
  * reverse-geocode UDF (`add_country.py:115-128`: one OSM HTTP call per row,
  * `ValueError` → literal `"No country"`) with a deterministic broadcast
  * range-join against a static bounding-box dimension table (SURVEY.md §2.7
  * U1 tier b). One network RPC per row does not survive 100 TB; a broadcast
  * nested-loop/range join against a few-hundred-row dim table costs nothing
  * and is retry-safe under task re-execution.
  *
  * Semantics preserved: every input row produces exactly one output row with
  * a `Country` column; unmatched points get `"No country"`
  * (`add_country.py:124`). Boxes must be non-overlapping for the 1:1 row
  * guarantee — `requireDisjoint` checks that at construction.
  */
object AddCountry {

  /** `add_country.py:124` fallback literal. */
  val NoCountry = "No country"

  case class Bbox(country: String, lat_min: Double, lat_max: Double,
                  lon_min: Double, lon_max: Double)

  /** Coarse, pairwise-disjoint demo boxes (FIXTURES.md §1.4 shape). Interval
    * semantics: lat ∈ [lat_min, lat_max), lon ∈ [lon_min, lon_max).
    * Deliberately leaves most of the globe (oceans) unmatched so the
    * "No country" path is exercised.
    */
  val defaultBoxes: Seq[Bbox] = Seq(
    Bbox("United States", 25.0, 49.0, -125.0, -66.0),
    Bbox("Canada", 49.0, 72.0, -141.0, -52.0),
    Bbox("Brazil", -34.0, 5.0, -74.0, -34.0),
    Bbox("Greenland", 59.0, 84.0, -52.0, -11.0),
    Bbox("Europe", 36.0, 71.0, -10.0, 40.0),
    Bbox("North Africa", 20.0, 36.0, -17.0, 40.0),
    Bbox("Sub-Saharan Africa", -35.0, 20.0, -17.0, 52.0),
    Bbox("Russia", 50.0, 78.0, 40.0, 180.0),
    Bbox("Middle East", 12.0, 42.0, 52.0, 63.0),
    Bbox("South Asia", 5.0, 36.0, 63.0, 93.0),
    Bbox("East Asia", 18.0, 50.0, 93.0, 146.0),
    Bbox("Australia", -44.0, -10.0, 112.0, 154.0))

  def requireDisjoint(boxes: Seq[Bbox]): Unit =
    for {
      (a, i) <- boxes.zipWithIndex
      b <- boxes.drop(i + 1)
    } require(
      a.lat_min >= b.lat_max || b.lat_min >= a.lat_max ||
        a.lon_min >= b.lon_max || b.lon_min >= a.lon_max,
      s"overlapping boxes: ${a.country} / ${b.country}")

  def boxesDf(spark: SparkSession, boxes: Seq[Bbox] = defaultBoxes): DataFrame = {
    requireDisjoint(boxes)
    import spark.implicits._
    boxes.toDF()
  }

  /** points ⟕ broadcast(boxes) on containment; null country → "No country".
    * The plan is BroadcastNestedLoopJoin — fine because the build side is a
    * tiny dim table; the stream side never shuffles.
    */
  def apply(points: DataFrame, boxes: DataFrame,
            latCol: String = "Latitude", lonCol: String = "Longitude"): DataFrame = {
    // rename the dim's `country` first: Spark's drop() is case-insensitive
    // by default, so dropping "country" after adding "Country" would kill both
    val dim = boxes.withColumnRenamed("country", "__bbox_country")
    points
      .join(
        broadcast(dim),
        col(latCol) >= col("lat_min") && col(latCol) < col("lat_max") &&
          col(lonCol) >= col("lon_min") && col(lonCol) < col("lon_max"),
        "left")
      .withColumn("Country", coalesce(col("__bbox_country"), lit(NoCountry)))
      .drop("__bbox_country", "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** Grid-indexed variant for LARGE box sets: the broadcast nested-loop
    * join above evaluates every point against every box — right at 12
    * boxes, wrong at 100k (polygon-table scale). Here each box is expanded
    * (driver-side; boxes are a dim table) into the coarse grid cells it
    * overlaps, points compute their one cell, and the join is a plain
    * equi-join on cell id + exact containment filter — hash-joinable,
    * broadcastable while the expanded dim fits, shuffle-joinable beyond.
    * Point cell count is always 1, so no point-side duplication; the final
    * left join restores unmatched rows with the "No country" fallback.
    */
  def viaGridIndex(points: DataFrame, boxes: Seq[Bbox], cellDeg: Double = 10.0,
                   latCol: String = "Latitude", lonCol: String = "Longitude"): DataFrame = {
    requireDisjoint(boxes)
    val spark = points.sparkSession
    import spark.implicits._
    // cells overlapped by [min, max): first = floor(min/cell); last =
    // ceil(max/cell) - 1 (max edge exclusive, so an exact-boundary max does
    // not claim the next cell)
    def cellRange(min: Double, max: Double, offset: Double): Range.Inclusive =
      math.floor((min + offset) / cellDeg).toInt to
        (math.ceil((max + offset) / cellDeg).toInt - 1)
    val boxCells = boxes.flatMap { b =>
      for {
        la <- cellRange(b.lat_min, b.lat_max, 90)
        lo <- cellRange(b.lon_min, b.lon_max, 180)
      } yield (la.toLong * 100000L + lo, b.country,
        b.lat_min, b.lat_max, b.lon_min, b.lon_max)
    }.toDF("cell", "__bbox_country", "lat_min", "lat_max", "lon_min", "lon_max")
    val withCell = points.withColumn("__cell",
      floor((col(latCol) + 90) / cellDeg).cast("long") * 100000L +
        floor((col(lonCol) + 180) / cellDeg).cast("long"))
    withCell
      .join(broadcast(boxCells),
        withCell("__cell") === boxCells("cell") &&
          col(latCol) >= col("lat_min") && col(latCol) < col("lat_max") &&
          col(lonCol) >= col("lon_min") && col(lonCol) < col("lon_max"),
        "left")
      .withColumn("Country", coalesce(col("__bbox_country"), lit(NoCountry)))
      .drop("cell", "__cell", "__bbox_country", "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** API-parity tier (SURVEY.md §2.7 U1 tier a): a pluggable scalar
    * resolver applied as a UDF, try/catch → "No country"
    * (`add_country.py:120-124`). Demo/compat only — the join tier above is
    * the scalable design.
    */
  def withResolver(points: DataFrame, resolve: (Double, Double) => String,
                   latCol: String = "Latitude", lonCol: String = "Longitude"): DataFrame = {
    val geo = udf { (lat: Double, lon: Double) =>
      try resolve(lat, lon)
      catch { case _: Exception => NoCountry }
    }
    points.withColumn("Country", geo(col(latCol), col(lonCol)))
  }
}
