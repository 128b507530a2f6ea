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

  /** Point-in-polygon membership (geofencing) by ray casting — PNPOLY
    * (W. R. Franklin's even-odd rule): a point is inside iff an
    * eastward ray crosses an odd number of polygon edges. The polygon
    * is a CONSTANT (a geofence, not a column), so the edge loop unrolls
    * into a codegen-friendly sum of per-edge CASE terms over plain
    * lat/lon arithmetic — no UDF, no explode, the whole test inlines
    * into the scan's WholeStageCodegen. Planar lon/lat semantics
    * (consistent with the oracle's replay); fences crossing the
    * antimeridian must be split by the caller. Horizontal edges
    * (yi == yj) are dropped at BUILD time: their straddle test
    * `(yi > lat) != (yj > lat)` is identically false, so the term is a
    * constant 0 — emitting it would only add a degenerate /0 division
    * for the optimizer to fold away. Vertices are listed in either
    * winding order, unclosed (last→first edge is implicit). */
  def withinPolygon(lat: Column, lon: Column, poly: Seq[(Double, Double)]): Column = {
    require(poly.size >= 3, s"polygon needs >= 3 vertices, got ${poly.size}")
    val crossings = polyEdges(poly).map { case ((yi, xi), (yj, xj)) =>
      when((lit(yi) > lat) =!= (lit(yj) > lat) &&
        lon < lit(xj - xi) * (lat - lit(yi)) / lit(yj - yi) + lit(xi), 1)
        .otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** Non-horizontal edges of the (implicitly closed) polygon. Dropping
    * yi == yj edges can never empty the list: a polygon of only
    * horizontal edges would be a degenerate line. */
  private def polyEdges(poly: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] =
    poly.indices.map(i => (poly(i), poly((i + 1) % poly.size)))
      .filter { case ((yi, _), (yj, _)) => yi != yj }

  /** The DuckDB replay of [[withinPolygon]] — identical per-edge
    * expression shape (same constant folding: dx and dy are literal
    * differences, the intercept is dx·(lat−yi)/dy + xi), so boundary
    * decisions round identically in both engines. */
  def withinPolygonSql(latS: String, lonS: String,
                       poly: Seq[(Double, Double)]): String = {
    val terms = polyEdges(poly).map { case ((yi, xi), (yj, xj)) =>
      s"(CASE WHEN (($yi > $latS) != ($yj > $latS)) AND " +
        s"$lonS < ${xj - xi} * ($latS - $yi) / ${yj - yi} + $xi THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** All-pairs radius join between two corpus-scale point tables —
    * "every (a, b) with dist(a,b) <= radiusKm" — WITHOUT the n² cross
    * join [[nearestK]]'s broadcast shape would need: the sphere is
    * gridded into latitude bands of height dLat = radius expressed as
    * meridian degrees, each band split into equal longitude cells wide
    * enough that two in-radius points can never sit more than one cell
    * apart; the join is then a plain equi-join on (band, cell) — a
    * hash shuffle on cell keys, candidate count bounded by local point
    * density, not table size.
    *
    * Soundness of the one-cell bound (no false negatives): haversine
    * gives hav(d/R) = hav(dphi) + cos(phi1)cos(phi2)·hav(dlmb), so
    * d <= r forces dphi <= r/R (the band bound) and
    * sin(dlmb/2) <= sin(r/2R)/(cos phi1 · cos phi2)^(1/2)... bounded
    * here by the WORST |lat| either endpoint can have — the band's own
    * extent widened by one full band (the partner may sit one band
    * over): dlmb <= 2·asin(min(1, sin(r/2R)/cos(worstLat))). Cell width
    * is at least that bound (floor on the cell COUNT only widens
    * cells), so the partner's cell index differs by at most 1. Bands
    * whose bound degenerates (worstLat -> 90, ratio >= 1) collapse to a
    * single cell — polar caps are compared exhaustively, correct and
    * cheap (they hold O(cos) of a uniform corpus). Longitude wraps
    * modulo the band's cell count, so the +-180 antimeridian is seam-
    * free. The right side replicates to its 3x3 (band, cell)
    * neighborhood, deduped; the left keeps its single home cell, so a
    * qualifying pair is emitted exactly once.
    *
    * Output: left row id, right row id, both sides' coordinates kept
    * under `a_`/`b_` prefixes. Self-join callers dedupe mirror pairs
    * with `a_id < b_id` downstream. */
  def radiusJoin(left: DataFrame, leftIdCol: String, leftLat: String, leftLon: String,
                 right: DataFrame, rightIdCol: String, rightLat: String, rightLon: String,
                 radiusKm: Double): DataFrame = {
    require(radiusKm > 0, s"bad radius $radiusKm")
    val dLat = math.toDegrees(radiusKm / EarthRadiusKm)
    val nBands = math.max(1, math.ceil(180.0 / dLat).toInt)
    val halfSin = math.sin(radiusKm / (2 * EarthRadiusKm))
    // band -> longitude cell count, same closed form both sides
    def cellsOf(band: Column): Column = {
      val worst = least(lit(90.0),
        greatest(abs(band * dLat - 90), abs((band + 1) * dLat - 90)) + lit(dLat))
      val ratio = lit(halfSin) / cos(radians(worst))
      val width = when(ratio >= 1, lit(360.0)).otherwise(degrees(asin(ratio)) * 2)
      greatest(lit(1L), floor(lit(360.0) / width))
    }
    def bandOf(latC: Column): Column =
      least(lit(nBands - 1L), greatest(lit(0L), floor((latC + 90) / dLat)))
    def idxIn(lonC: Column, cells: Column): Column =
      pmod(floor((lonC + 180) * cells / 360.0), cells)

    val a = left.select(col(leftIdCol).as("a_id"),
        col(leftLat).as("a_lat"), col(leftLon).as("a_lon"))
      .withColumn("__band", bandOf(col("a_lat")))
      .withColumn("__cell", idxIn(col("a_lon"), cellsOf(col("__band"))))
    val b0 = right.select(col(rightIdCol).as("b_id"),
      col(rightLat).as("b_lat"), col(rightLon).as("b_lon"))
    // replicate right rows to the 3x3 neighborhood: neighbor band's own
    // cell count decides the lon index (band widths differ), wrap modulo
    val b = b0
      .withColumn("__db", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band", bandOf(col("b_lat")) + col("__db"))
      .filter(col("__band") >= 0 && col("__band") <= lit(nBands - 1L))
      .withColumn("__cells", cellsOf(col("__band")))
      .withColumn("__dc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__cell", pmod(idxIn(col("b_lon"), col("__cells")) + col("__dc"), col("__cells")))
      .select(col("b_id"), col("b_lat"), col("b_lon"), col("__band"), col("__cell"))
      .dropDuplicates("b_id", "__band", "__cell")
    a.join(b, Seq("__band", "__cell"))
      .filter(haversineKm(col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon")) <= lit(radiusKm))
      .drop("__band", "__cell")
  }

  /** Point-in-polygon over a polygon TABLE — the dynamic-column form of
    * [[withinPolygon]] (whose constant unrolling needs the polygon at
    * plan time): same PNPOLY even-odd crossing arithmetic, evaluated
    * over vertex ARRAY columns with higher-order functions (filter +
    * element_at — codegen lambda, no UDF, no explode of vertices).
    * Horizontal edges short-circuit inside the lambda's CASE before the
    * division can see yj−yi = 0 (the build-time drop is impossible when
    * the polygon is data). */
  def pointInPolyCol(plat: Column, plon: Column,
                     lats: Column, lons: Column): Column = {
    val n = size(lats)
    val crossing = filter(sequence(lit(0), n - 1), i => {
      val yi = element_at(lats, (i + 1).cast("int"))
      val xi = element_at(lons, (i + 1).cast("int"))
      val j = (pmod(i + 1, n) + 1).cast("int")
      val yj = element_at(lats, j)
      val xj = element_at(lons, j)
      when(yi === yj, lit(false))
        .when(!((yi > plat) =!= (yj > plat)), lit(false))
        .otherwise(plon < (xj - xi) * (plat - yi) / (yj - yi) + xi)
    })
    pmod(size(crossing), lit(2)) === 1
  }

  /** Spatial join: which points fall inside which polygons, against a
    * polygon TABLE (delivery zones, geofence sets, admin regions) —
    * [[withinPolygon]] handles ONE constant fence; this joins N.
    *
    * Plan: each polygon expands to the fixed-degree grid cells its
    * bounding box overlaps (explode bounded by `maxCellsPerPoly` — a
    * LOUD driver-side check, since a continent-sized polygon at a fine
    * grid is a modeling error, not a plan to run); points key by their
    * single home cell; ONE equi-join on the cell key; exact ray-cast
    * refine on the candidates. Pair space is Σ per-cell
    * points×polygons — never points×polygons.
    *
    * Polygon rows: (polyIdCol, latsCol: array<double>, lonsCol:
    * array<double>), unclosed, either winding, antimeridian-crossing
    * polygons split by the caller (the [[withinPolygon]] contract). */
  def polygonJoin(points: DataFrame, idCol: String, latCol: String, lonCol: String,
                  polys: DataFrame, polyIdCol: String,
                  latsCol: String, lonsCol: String,
                  cellDeg: Double = 5.0, maxCellsPerPoly: Long = 4096L): DataFrame = {
    require(cellDeg > 0, s"bad cellDeg $cellDeg")
    val p = polys.select(col(polyIdCol).as("poly_id"),
        col(latsCol).as("__lats"), col(lonsCol).as("__lons"))
      .withColumn("__la0", floor(array_min(col("__lats")) / cellDeg).cast("long"))
      .withColumn("__la1", floor(array_max(col("__lats")) / cellDeg).cast("long"))
      .withColumn("__lo0", floor(array_min(col("__lons")) / cellDeg).cast("long"))
      .withColumn("__lo1", floor(array_max(col("__lons")) / cellDeg).cast("long"))
    // loud guard BEFORE the explode: the polygon table is zone-catalog
    // scale (metadata, not corpus), so one aggregate over it is free
    val worst = p.agg(coalesce(max(
      (col("__la1") - col("__la0") + 1) * (col("__lo1") - col("__lo0") + 1)),
      lit(0L))).head().getLong(0)
    require(worst <= maxCellsPerPoly,
      s"a polygon's bbox spans $worst grid cells at cellDeg=$cellDeg " +
        s"(cap $maxCellsPerPoly) — coarsen cellDeg or split the polygon")
    val cells = p
      .withColumn("__latc", explode(sequence(col("__la0"), col("__la1"))))
      .withColumn("__lonc", explode(sequence(col("__lo0"), col("__lo1"))))
      .select(col("poly_id"), col("__lats"), col("__lons"),
        col("__latc"), col("__lonc"))
    val pts = points
      .withColumn("__latc", floor(col(latCol) / cellDeg).cast("long"))
      .withColumn("__lonc", floor(col(lonCol) / cellDeg).cast("long"))
    pts.join(cells, Seq("__latc", "__lonc"))
      .filter(pointInPolyCol(col(latCol), col(lonCol),
        col("__lats"), col("__lons")))
      .drop("__latc", "__lonc", "__lats", "__lons")
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
