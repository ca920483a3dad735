package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo query surface — the engine analog of the reference's 2dsphere
  * index on `venue.coordinates` (reference: database/fix_schema.py:
  * 131-134). Mongo's `$near`/`$geoWithin` become Column algebra:
  *
  *  - bbox: four comparisons on stored lat/lon columns — these push
  *    down to the parquet scan (verified in PlanAuditSpec), so a
  *    bbox query at 100 TB reads only row groups whose min/max stats
  *    intersect the box.
  *  - radius: haversine is trig and can NEVER push down — so the
  *    operator wraps an exact haversine in a degree-bounds bbox
  *    PREFILTER derived from the radius. The scan prunes on the box
  *    (the index analog); the exact great-circle test runs only on
  *    survivors. Same two-phase shape every geo index uses.
  */
object GeoOps {

  /** Mean Earth radius (IUGG), the value Mongo's spherical queries
    * and PostGIS default to.
    */
  val EarthRadiusM = 6371008.8

  /** Great-circle distance in meters, asin-haversine formulation —
    * numerically stable for the small distances near-dup venue
    * queries care about (atan2 form only matters near antipodes).
    */
  def haversineMeters(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val h = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusM) * asin(sqrt(h))
  }

  /** Bounding-box predicate on stored columns — pushdown-eligible. */
  def bboxFilter(lat: Column, lon: Column, minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double): Column =
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon

  /** Degree half-spans of a bbox that CONTAINS the radius circle:
    * 1° latitude ≈ 111.32 km everywhere; 1° longitude shrinks by
    * cos(lat). 10% slack keeps the prefilter strictly conservative
    * (it may pass extra rows — the exact haversine rejects them —
    * but must never drop a true hit).
    */
  def radiusPrefilter(lat: Column, lon: Column, centerLat: Double,
      centerLon: Double, radiusM: Double): Column = {
    val latSpan = radiusM / 111320.0 * 1.1
    val lonSpan = radiusM / (111320.0 * math.cos(math.toRadians(centerLat))) * 1.1
    bboxFilter(lat, lon, centerLat - latSpan, centerLat + latSpan,
      centerLon - lonSpan, centerLon + lonSpan)
  }
}

/** Oracle-checked geo queries: deterministic venue coordinates spread
  * around the Ibiza box (pure doc_id arithmetic — double multiply/add
  * of the same literals is bit-identical across engines), haversine
  * recomputed by DuckDB from the same formula. Distances are rounded
  * to 1 mm before compare/output: the formula's *,+,/,sqrt steps are
  * IEEE-exact, but sin/cos/asin are libm-dependent (Java vs DuckDB's
  * C++ stdlib may differ in the last ulp) — at mm grain an ulp of
  * slack on a ~10 km value is 10 orders of magnitude away from
  * flipping a rounded digit.
  */
object GeoQueries {

  /** Ushuaïa Ibiza Beach Hotel — the reference corpus' densest venue. */
  val centerLat = 38.8839
  val centerLon = 1.4097

  private def lat = (col("doc_id") % 100).cast("double") * 0.003 + 38.80
  private def lon = (col("doc_id") % 83).cast("double") * 0.004 + 1.20

  val registry: Map[String, QueryDef] = Map(

    // $near analog: events within 5 km of Ushuaïa, nearest first.
    // The operator applies the pushdown-eligible bbox prefilter, then
    // the exact haversine; the oracle recomputes haversine over ALL
    // rows — agreement proves the prefilter dropped nothing.
    "geo_radius" -> QueryDef(
      (s, d) => {
        val ev = T.documents(s, d).select(
          concat(lit("ev"), col("doc_id")).as("event_id"),
          col("doc_id"), lat.as("lat"), lon.as("lon"))
        val radius = 5000.0
        ev.filter(GeoOps.radiusPrefilter(col("lat"), col("lon"),
            centerLat, centerLon, radius))
          .withColumn("dist_m", round(GeoOps.haversineMeters(
            col("lat"), col("lon"), lit(centerLat), lit(centerLon)), 3))
          .filter(col("dist_m") <= radius)
          .select(col("event_id"), col("lat"), col("lon"), col("dist_m"))
          .orderBy(col("dist_m"), col("event_id"))
      },
      s"""WITH ev AS (
         |  SELECT 'ev' || doc_id AS event_id,
         |    CAST(doc_id % 100 AS DOUBLE) * 0.003 + 38.80 AS lat,
         |    CAST(doc_id % 83 AS DOUBLE) * 0.004 + 1.20 AS lon
         |  FROM documents),
         |d AS (
         |  SELECT *, ROUND(2 * 6371008.8 * ASIN(SQRT(
         |    POW(SIN(RADIANS(lat - $centerLat) / 2), 2) +
         |    COS(RADIANS($centerLat)) * COS(RADIANS(lat)) *
         |    POW(SIN(RADIANS(lon - $centerLon) / 2), 2))), 3) AS dist_m
         |  FROM ev)
         |SELECT event_id, lat, lon, dist_m FROM d
         |WHERE dist_m <= 5000.0 ORDER BY dist_m, event_id""".stripMargin),

    // $geoWithin box analog: the Ibiza island box the quality scorer
    // validates against (reference: database/quality_scorer.py:176-189)
    // as a standalone query — four scan-pushable comparisons + a
    // count-by-venue-cell rollup.
    "geo_bbox" -> QueryDef(
      (s, d) => {
        val ev = T.documents(s, d).select(
          col("doc_id"), lat.as("lat"), lon.as("lon"))
        // cell ids via floor(x*100): floor on a double is exact and
        // both engines floor the SAME double, unlike decimal round
        // (Spark rounds the shortest-decimal repr, DuckDB the binary
        // value — a grouping key must not sit on that fault line)
        ev.filter(GeoOps.bboxFilter(col("lat"), col("lon"),
            38.86, 38.95, 1.38, 1.46))
          .groupBy(floor(col("lat") * 100).as("cell_lat"),
            floor(col("lon") * 100).as("cell_lon"))
          .agg(count(lit(1)).as("n_events"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("cell_lat"), col("cell_lon"))
      },
      """WITH ev AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 100 AS DOUBLE) * 0.003 + 38.80 AS lat,
        |    CAST(doc_id % 83 AS DOUBLE) * 0.004 + 1.20 AS lon
        |  FROM documents)
        |SELECT CAST(FLOOR(lat * 100) AS BIGINT) AS cell_lat,
        |  CAST(FLOOR(lon * 100) AS BIGINT) AS cell_lon,
        |  COUNT(*) AS n_events, MIN(doc_id) AS first_doc
        |FROM ev
        |WHERE lat >= 38.86 AND lat <= 38.95 AND lon >= 1.38 AND lon <= 1.46
        |GROUP BY 1, 2 ORDER BY cell_lat, cell_lon""".stripMargin)
  )
}
