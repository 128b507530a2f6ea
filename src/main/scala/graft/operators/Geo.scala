package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial operators over the reference's `Location` model field —
  * a GeoJSON point `{type, coordinates: List<float>}` on customer
  * addresses (Customer.cs:79-89; SURVEY §1.2 maps it to
  * `StructType(type, ArrayType(FloatType))`). The reference stores the
  * column but never computes on it; these are the operators an
  * analytics user hits immediately ("orders within 50 km of a store"):
  * great-circle distance, radius filter, nearest-k-by-location join.
  *
  * All plain arithmetic + trig on doubles — every expression is
  * codegen-friendly `functions._` composition (no UDF), and the same
  * closed-form math runs in the DuckDB oracle.
  */
object Geo {

  /** IUGG mean Earth radius, km. */
  val EarthRadiusKm: Double = 6371.0088

  /** Great-circle distance in km between two (degree) lat/lon pairs —
    * the haversine formula: 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).
    * The √ argument is clamped at 1 before asin: for near-antipodal
    * points float rounding can push it a hair above 1, and asin(1+ε)
    * is NaN — the clamp costs nothing and caps the distance at πR. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2) - radians(lat1)
    val dlmb = radians(lon2) - radians(lon1)
    val a = sin(dphi / 2) * sin(dphi / 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlmb / 2) * sin(dlmb / 2)
    lit(2 * EarthRadiusKm) * asin(least(lit(1.0), sqrt(a)))
  }

  /** The DuckDB replay of [[haversineKm]] — kept beside the Scala so a
    * formula change cannot silently diverge from its oracle. The
    * expression SHAPE mirrors the Scala term for term (radians applied
    * per operand, then subtracted — not radians of the difference):
    * mathematically equal forms round differently in IEEE doubles, and
    * identical shape keeps boundary decisions aligned across engines. */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2 * $EarthRadiusKm * asin(least(1.0, sqrt(" +
      s"sin((radians($lat2) - radians($lat1))/2) * sin((radians($lat2) - radians($lat1))/2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"sin((radians($lon2) - radians($lon1))/2) * sin((radians($lon2) - radians($lon1))/2))))"

  /** Rows within `radiusKm` of the center, two-phase: a SARGABLE
    * bounding-box prefilter (plain BETWEEN on the lat/lon columns —
    * when they are physical parquet columns the ranges reach the scan
    * as PushedFilters, so at 100 TB row groups outside the box are
    * skipped before any trig runs), then the exact haversine refine on
    * the survivors. The box is conservative: Δlat from the meridian
    * arc, Δlon widened by 1/cos(lat) at the box's worst latitude; when
    * the box crosses a pole or the ±180 antimeridian the corresponding
    * bound degenerates to pass-through (refine still exact). */
  def withinRadius(df: DataFrame, latCol: String, lonCol: String,
                   centerLat: Double, centerLon: Double, radiusKm: Double): DataFrame = {
    require(radiusKm >= 0, s"bad radius $radiusKm")
    val dLat = math.toDegrees(radiusKm / EarthRadiusKm)
    // worst-case |lat| inside the box bounds the longitude widening
    val worstLat = math.min(90.0, math.max(math.abs(centerLat - dLat), math.abs(centerLat + dLat)))
    val cosWorst = math.cos(math.toRadians(worstLat))
    val poleInBox = centerLat + dLat >= 90.0 || centerLat - dLat <= -90.0
    val dLon = if (poleInBox || cosWorst <= 1e-12) 360.0
      else math.toDegrees(radiusKm / EarthRadiusKm) / cosWorst
    val latPred = col(latCol) >= lit(centerLat - dLat) && col(latCol) <= lit(centerLat + dLat)
    val lonPred =
      if (dLon >= 180.0 || centerLon - dLon < -180.0 || centerLon + dLon > 180.0) lit(true)
      else col(lonCol) >= lit(centerLon - dLon) && col(lonCol) <= lit(centerLon + dLon)
    df.filter(latPred && lonPred)
      .filter(haversineKm(col(latCol), col(lonCol), lit(centerLat), lit(centerLon)) <= lit(radiusKm))
  }

  /** Nearest-k points per probe by great-circle distance — the serve
    * shape (few probes, corpus-scale points): probes broadcast, each
    * point computes its distance to every probe in one pass, map-side
    * partial top-k (the same TopKAgg the vector k-NN join uses), so
    * the only shuffled rows are k-sized per-partition heaps. Output
    * (probe_id, <idCol>, dist_km, rn), ties broken by id. */
  def nearestK(points: DataFrame, idCol: String, latCol: String, lonCol: String,
               probes: DataFrame, probeIdCol: String,
               probeLatCol: String, probeLonCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val topk = udaf(new graft.search.VectorSearch.TopKAgg(k))
    val p = probes.select(col(probeIdCol).cast("long").as("probe_id"),
      col(probeLatCol).as("__plat"), col(probeLonCol).as("__plon"))
    points
      .crossJoin(broadcast(p))
      .withColumn("__negd",
        -haversineKm(col(latCol), col(lonCol), col("__plat"), col("__plon")))
      .groupBy(col("probe_id"))
      .agg(topk(col(idCol).cast("long"), col("__negd")).as("hits"))
      .select(col("probe_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("probe_id"), col("hit._1").as(idCol),
        (-col("hit._2")).as("dist_km"), (col("pos") + 1).as("rn"))
  }
}
