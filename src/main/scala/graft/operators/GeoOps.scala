package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Z-order (Morton) curve value of a coordinate pair — the 2-D
    * locality LAYOUT tool completing the indexes→layout story: sort
    * (or range-partition) the stored table by `z` and a bbox query
    * prunes row groups on BOTH dimensions at once via one 1-D range,
    * because bit-interleaving is monotone in each coordinate — every
    * point inside a bbox has z between the z of the box's low and
    * high corners (a superset range; the exact bbox predicate runs on
    * survivors, the same two-phase contract as the radius prefilter).
    * 16 bits per dimension over the full lat/lon domain ≈ 300 m cells
    * at the equator. Pure integer shift/mask algebra after one floor
    * quantization — replayable and pushdown-friendly.
    */
  /** Nearest-neighbor join via a 3×3 grid-cell probe: both sides get
    * an integral (cell_lat, cell_lon) coordinate at `cellDeg`
    * granularity, each query row explodes into its 9-cell neighborhood
    * IN PLACE, and the equi-join on the cell pair confines candidate
    * pairs to the neighborhood — the all-pairs cross join never
    * exists. Correct whenever the true nearest neighbor lies within
    * `cellDeg` (Chebyshev) of the query: the neighborhood then
    * contains it, and taking the per-query min over candidates returns
    * it exactly. Callers pick `cellDeg` ≥ the corpus' worst-case NN
    * distance (here the fixture lattice bounds it at 0.005°; the
    * general recipe is a density-derived bound or an escalating
    * multi-ring probe). One shuffle on the cell key; per-cell
    * populations bound the join fan-out, so skew follows point
    * density, not corpus size. Distances are squared degrees
    * (planar — the box is 0.3° wide; ordering is what matters),
    * computed with IEEE exactly-rounded ops only, ties broken by
    * corpus id, so the winner is engine-exact.
    */
  def nnJoinGrid(queries: DataFrame, corpus: DataFrame, idCol: String,
      latCol: String, lonCol: String, cellDeg: Double): DataFrame = {
    def cells(df: DataFrame) = df
      .withColumn("_cla", floor(col(latCol) / lit(cellDeg)).cast("long"))
      .withColumn("_clo", floor(col(lonCol) / lit(cellDeg)).cast("long"))
    val q = cells(queries)
      .select(col(idCol).as("q_id"), col(latCol).as("q_lat"),
        col(lonCol).as("q_lon"),
        explode(array((-1 to 1).flatMap(a => (-1 to 1).map(b =>
          struct((col("_cla") + a).as("cla"), (col("_clo") + b).as("clo"))))
          : _*)).as("nb"))
      .select(col("q_id"), col("q_lat"), col("q_lon"),
        col("nb.cla").as("_cla"), col("nb.clo").as("_clo"))
    val c = cells(corpus).select(col("_cla"), col("_clo"),
      col(idCol).as("c_id"), col(latCol).as("c_lat"),
      col(lonCol).as("c_lon"))
    val d2 = (col("q_lat") - col("c_lat")) * (col("q_lat") - col("c_lat")) +
      (col("q_lon") - col("c_lon")) * (col("q_lon") - col("c_lon"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
    q.join(c, Seq("_cla", "_clo"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), d2.as("d2"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("q_id"), col("c_id").as("nn_id"), col("d2"))
  }

  def zValue(lat: Column, lon: Column): Column = {
    def quant(c: Column, off: Double, span: Double) =
      greatest(lit(0L), least(lit(65535L),
        floor((c + lit(off)) / lit(span) * lit(65535.0)).cast("long")))
    val qlat = quant(lat, 90.0, 180.0)
    val qlon = quant(lon, 180.0, 360.0)
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(qlat, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftrightunsigned(qlon, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

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
    // Z-order layout check: every row inside the bbox must carry a z
    // value between the box corners' z (the monotone-interleave
    // containment a z-sorted layout prunes by) — n_escaped pins the
    // guarantee at 0, n_zrange measures the superset's false-positive
    // cost, z_checksum pins the curve values themselves. The oracle
    // regenerates the identical interleave from the same Scala loop.
    "geo_zorder" -> QueryDef(
      (s, d) => {
        val ev = T.documents(s, d).select(
          col("doc_id"), lat.as("lat"), lon.as("lon"))
        val z = GeoOps.zValue(col("lat"), col("lon"))
        val zLo = GeoOps.zValue(lit(38.86), lit(1.38))
        val zHi = GeoOps.zValue(lit(38.95), lit(1.46))
        val inBox = GeoOps.bboxFilter(col("lat"), col("lon"),
          38.86, 38.95, 1.38, 1.46)
        ev.withColumn("z", z)
          .agg(
            sum(when(inBox, 1L).otherwise(0L)).as("n_bbox"),
            sum(when(col("z").between(zLo, zHi), 1L).otherwise(0L))
              .as("n_zrange"),
            sum(when(inBox && !col("z").between(zLo, zHi), 1L)
              .otherwise(0L)).as("n_escaped"),
            sum(when(inBox, col("z")).otherwise(0L)).as("z_checksum"))
      },
      {
        def zSql(qlat: String, qlon: String) = (0 until 16).map(i =>
          s"((($qlat >> $i) & 1) << ${2 * i + 1}) + " +
            s"((($qlon >> $i) & 1) << ${2 * i})").mkString(" + ")
        def quantSql(c: String, off: String, span: String) =
          s"GREATEST(CAST(0 AS BIGINT), LEAST(CAST(65535 AS BIGINT), " +
            s"CAST(FLOOR(($c + CAST($off AS DOUBLE)) / CAST($span AS DOUBLE)" +
            s" * CAST(65535.0 AS DOUBLE)) AS BIGINT)))"
        s"""WITH ev AS (
           |  SELECT doc_id,
           |    CAST(doc_id % 100 AS DOUBLE) * 0.003 + 38.80 AS lat,
           |    CAST(doc_id % 83 AS DOUBLE) * 0.004 + 1.20 AS lon
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, lat, lon,
           |    ${quantSql("lat", "90.0", "180.0")} AS qlat,
           |    ${quantSql("lon", "180.0", "360.0")} AS qlon
           |  FROM ev),
           |z AS (
           |  SELECT doc_id, lat, lon,
           |    ${zSql("qlat", "qlon")} AS z
           |  FROM q),
           |corners AS (
           |  SELECT
           |    ${quantSql("CAST(38.86 AS DOUBLE)", "90.0", "180.0")} AS qlat_lo,
           |    ${quantSql("CAST(1.38 AS DOUBLE)", "180.0", "360.0")} AS qlon_lo,
           |    ${quantSql("CAST(38.95 AS DOUBLE)", "90.0", "180.0")} AS qlat_hi,
           |    ${quantSql("CAST(1.46 AS DOUBLE)", "180.0", "360.0")} AS qlon_hi),
           |zc AS (
           |  SELECT ${zSql("qlat_lo", "qlon_lo")} AS z_lo,
           |    ${zSql("qlat_hi", "qlon_hi")} AS z_hi
           |  FROM corners)
           |SELECT
           |  CAST(SUM(CASE WHEN lat >= 38.86 AND lat <= 38.95
           |    AND lon >= 1.38 AND lon <= 1.46 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_bbox,
           |  CAST(SUM(CASE WHEN z >= z_lo AND z <= z_hi THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_zrange,
           |  CAST(SUM(CASE WHEN lat >= 38.86 AND lat <= 38.95
           |    AND lon >= 1.38 AND lon <= 1.46
           |    AND NOT (z >= z_lo AND z <= z_hi) THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_escaped,
           |  CAST(SUM(CASE WHEN lat >= 38.86 AND lat <= 38.95
           |    AND lon >= 1.38 AND lon <= 1.46 THEN z ELSE 0 END) AS BIGINT)
           |    AS z_checksum
           |FROM z, zc""".stripMargin
      }),

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
        |GROUP BY 1, 2 ORDER BY cell_lat, cell_lon""".stripMargin),

    // Nearest-neighbor join (GeoOps.nnJoinGrid): "closest venue to
    // each event" — each query point probes only its 3×3 cell
    // neighborhood (cell 0.02° ≥ the fixture lattice's 0.005° NN
    // bound, so the probe provably contains the true NN), vs the
    // oracle which brute-forces ALL pairs with a window — a different
    // algorithm, so a single wrong winner turns the row red. The
    // census pins the full assignment (sum q_id·nn_id) and the exact
    // distances (floored ×1e12 squared degrees — IEEE-exact ops
    // only); n_zero_dist guards the dedup edge (ids 8300 apart would
    // share a lattice position — absent below 8300 docs, so 0 at
    // every sf, and the cell would catch a collapse to self-joins).
    "geo_knn_join" -> QueryDef(
      (s, d) => {
        val pts = T.documents(s, d).select(
          col("doc_id"), lat.as("lat"), lon.as("lon"))
        val nn = GeoOps.nnJoinGrid(
          pts.filter(col("doc_id") < 300), pts,
          "doc_id", "lat", "lon", cellDeg = 0.02)
        nn.agg(
          count(lit(1)).as("n_queries"),
          sum(col("q_id") * col("nn_id")).as("nn_checksum"),
          sum(floor(col("d2") * 1e12).cast("long")).as("sum_d2_x1e12"),
          sum(when(col("d2") === 0.0, 1L).otherwise(0L)).as("n_zero_dist"))
      },
      """WITH pts AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 100 AS DOUBLE) * 0.003 + 38.80 AS lat,
        |    CAST(doc_id % 83 AS DOUBLE) * 0.004 + 1.20 AS lon
        |  FROM documents),
        |q AS (SELECT * FROM pts WHERE doc_id < 300),
        |ranked AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |    (q.lat - c.lat) * (q.lat - c.lat) +
        |      (q.lon - c.lon) * (q.lon - c.lon) AS d2,
        |    row_number() OVER (PARTITION BY q.doc_id
        |      ORDER BY (q.lat - c.lat) * (q.lat - c.lat) +
        |        (q.lon - c.lon) * (q.lon - c.lon), c.doc_id) AS rn
        |  FROM q, pts c
        |  WHERE c.doc_id <> q.doc_id)
        |SELECT COUNT(*) AS n_queries,
        |  CAST(SUM(q_id * c_id) AS BIGINT) AS nn_checksum,
        |  CAST(SUM(CAST(floor(d2 * 1e12) AS BIGINT)) AS BIGINT)
        |    AS sum_d2_x1e12,
        |  CAST(SUM(CASE WHEN d2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_dist
        |FROM ranked WHERE rn = 1""".stripMargin)
  )
}
