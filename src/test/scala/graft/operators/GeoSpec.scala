package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class GeoSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def dist(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .head().getDouble(0)

  test("haversine matches hand-computed distances") {
    // Paris (48.8566, 2.3522) -> London (51.5074, -0.1278)
    assert(math.abs(dist(48.8566, 2.3522, 51.5074, -0.1278) - 343.5565) < 0.01)
    // one degree of longitude at the equator = 2πR/360
    assert(math.abs(dist(0, 0, 0, 1) - 111.19508) < 0.001)
    assert(dist(12.34, 56.78, 12.34, 56.78) == 0.0)
    // symmetry
    assert(dist(10, 20, 30, 40) == dist(30, 40, 10, 20))
  }

  test("antipodal points: clamp guards asin against rounding, distance = πR") {
    val piR = math.Pi * Geo.EarthRadiusKm
    val a = dist(0, 0, 0, 180)
    val b = dist(90, 0, -90, 0)
    assert(!a.isNaN && !b.isNaN)
    assert(math.abs(a - piR) < 1e-6 && math.abs(b - piR) < 1e-6)
  }

  test("withinRadius keeps exactly the points inside, excludes the rest") {
    // distances from (0,0): (0,1)≈111.2, (1,0)≈111.2, (0,3)≈333.6, (45,45)≈6672
    val pts = Seq((1L, 0.0, 1.0), (2L, 1.0, 0.0), (3L, 0.0, 3.0), (4L, 45.0, 45.0))
      .toDF("id", "lat", "lon")
    val got = Geo.withinRadius(pts, "lat", "lon", 0.0, 0.0, 200.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
    val wide = Geo.withinRadius(pts, "lat", "lon", 0.0, 0.0, 400.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(wide == Seq(1L, 2L, 3L))
  }

  test("withinRadius near a pole and across the antimeridian stays exact") {
    val pts = Seq((1L, 89.5, 0.0), (2L, 89.5, 180.0), (3L, 80.0, 90.0),
      (4L, 0.0, 179.9), (5L, 0.0, -179.9)).toDF("id", "lat", "lon")
    // pole box: (89.5,0) and (89.5,180) are ~111 km apart over the pole;
    // the lon bound degenerates to pass-through, the refine stays exact
    val polar = Geo.withinRadius(pts, "lat", "lon", 90.0, 0.0, 120.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(polar == Seq(1L, 2L))
    // antimeridian: (0,179.9) and (0,-179.9) are ~22 km apart; a naive
    // [-180,180]-clamped box around center lon 179.95 would drop id 5
    val anti = Geo.withinRadius(pts, "lat", "lon", 0.0, 179.95, 50.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(anti == Seq(4L, 5L))
  }

  test("bounding-box prefilter reaches the parquet scan as pushed filters") {
    val dir = Files.createTempDirectory("graft-geo").toString + "/pts"
    Seq((1L, 10.0, 20.0), (2L, 50.0, 60.0)).toDF("id", "lat", "lon")
      .write.parquet(dir)
    // default metadata truncation (100 chars) cuts the PushedFilters list
    // before the lon bounds appear in toString
    spark.conf.set("spark.sql.maxMetadataStringLength", 2000)
    val plan = Geo.withinRadius(spark.read.parquet(dir), "lat", "lon", 10.0, 20.0, 100.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(lat") && plan.contains("LessThanOrEqual(lon"),
      s"bounding box not pushed:\n$plan")
  }

  test("nearestK ranks by distance with id tie-break, k per probe") {
    val pts = Seq((1L, 0.0, 1.0), (2L, 0.0, 2.0), (3L, 0.0, 3.0),
      (4L, 0.0, -1.0), (5L, 10.0, 10.0)).toDF("id", "lat", "lon")
    val probes = Seq((100L, 0.0, 0.0)).toDF("pid", "plat", "plon")
    val got = Geo.nearestK(pts, "id", "lat", "lon", probes, "pid", "plat", "plon", k = 3)
      .orderBy("rn").select("id", "rn").as[(Long, Int)].collect().toSeq
    // (0,1) and (0,-1) are equidistant: id ascending breaks the tie
    assert(got == Seq((1L, 1), (4L, 2), (2L, 3)))
  }

  test("nearestK distances agree with haversine recomputation") {
    val pts = Seq((1L, 48.8566, 2.3522)).toDF("id", "lat", "lon")
    val probes = Seq((7L, 51.5074, -0.1278)).toDF("pid", "plat", "plon")
    val d = Geo.nearestK(pts, "id", "lat", "lon", probes, "pid", "plat", "plon", k = 1)
      .select("dist_km").head().getDouble(0)
    assert(math.abs(d - 343.5565) < 0.01)
  }
}
