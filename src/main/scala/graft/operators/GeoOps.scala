package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.sources.Tables

/** Geospatial operators: grid-blocked haversine radius join — the
  * spatial-join shape every warehouse eventually needs (stores near
  * customers, cell towers near users) re-expressed as a plain equi-join
  * on grid cells so Catalyst plans it like any other join.
  *
  * The tables carry no coordinates, so both engines derive
  * deterministic synthetic ones from the integer keys with pure integer
  * arithmetic (identical cross-engine by construction):
  * `lat = -60 + (key*37 % 1200)/10`, `lon = -180 + (key*91 % 3600)/10`.
  * Latitudes stay in [-60, 60) so the longitude compression factor
  * `cos(lat)` is bounded below by 0.5 — which is what makes a FIXED
  * grid-cell size safe (see the blocking bound below).
  *
  * Scale: the naive radius join is customer × supplier — a cartesian
  * product that is quadratic at 100 TB. The grid scheme is the standard
  * distributed spatial join: each supplier lands in exactly one
  * (5° lat × 10° lon) cell; each customer probes its own cell plus the
  * 8 neighbors (a bounded 9× map-side fan-out on the PROBE side only);
  * the join is then a plain equi-join on the cell id — shuffle keyed on
  * cells, broadcastable when one side is a dimension, AQE-skew-splittable
  * when a city cell is hot. Correctness of the blocking: two points
  * within R=500 km differ by ≤ 500/111.195 = 4.50° latitude (< 5°) and
  * ≤ 500/(111.195·cos(60°)) = 8.99° longitude (< 10°), so every
  * qualifying pair shares a cell or touches a neighbor cell — the
  * DuckDB oracle is the brute-force cross join, proving no pair is
  * missed. Longitude cells wrap at the antimeridian (mod 36).
  */
object GeoOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val RadiusKm = 500.0

  /** Synthetic-but-deterministic coordinates from an integer key. */
  private def latOf(key: Column): Column = lit(-60.0) + (key * 37 % 1200) / 10.0
  private def lonOf(key: Column): Column = lit(-180.0) + (key * 91 % 3600) / 10.0

  private val haversineSql =
    """floor(2 * 6371.0 * asin(sqrt(least(1.0,
      |    sin(radians(s.lat - c.lat)/2) * sin(radians(s.lat - c.lat)/2)
      |    + cos(radians(c.lat)) * cos(radians(s.lat))
      |      * sin(radians(s.lon - c.lon)/2) * sin(radians(s.lon - c.lon)/2))))
      |  * 100.0 + 0.5) / 100.0""".stripMargin

  /** G1: suppliers within 500 km of each customer — count and nearest
    * distance. Spark side is the grid-blocked join; oracle is the
    * brute-force cross join, so the hash match proves the blocking
    * loses no pair.
    */
  private val radiusJoin = QueryDef(
    "g1_geo_radius_join",
    (s, dir) => {
      // The 9-cell neighbor fan-out goes on the SMALL side (suppliers):
      // a pair within R differs by ≤1 cell in each axis, so supplier-
      // replicated-into-neighbors ⋈ customer-in-own-cell enumerates
      // exactly the pairs customer-probes-9-cells would — but the
      // exploded table is 9×|supplier|, not 9×|customer| (15× less
      // shuffle at the sf10 cardinalities, and the big side stays a
      // plain one-row-per-customer scan).
      // (A finer 2.25°×4.5° grid with a 5×5 window was measured at sf10
      // and does NOT pay: the 0.56× candidate cut is offset by the 25×-
      // replicated broadcast hash table's probe cost — 57.5 s vs 54.5 s.)
      val nbrs = array((for { dx <- -1 to 1; dy <- -1 to 1 }
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
      // At sf10 the row is OUTPUT-bound (~1.5B qualifying pairs out of
      // ~1.6B bbox survivors — r11 plan audit), so the remaining lever
      // is per-candidate trig cost: precompute radians + cos(lat) ONCE
      // per input row on each side (r12). The per-candidate expression
      // drops from 2·sin + 2·cos + asin to 2·sin + asin — cos(lat) is
      // constant per point but codegen re-evaluates projection
      // expressions per JOINED row, so hoisting it into the pre-join
      // projections is a real cut, at +16 bytes/row of broadcast width.
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"),
          latOf(col("s_suppkey")).as("s_lat"), lonOf(col("s_suppkey")).as("s_lon"))
        .withColumn("s_radlat", radians(col("s_lat")))
        .withColumn("s_coslat", cos(col("s_radlat")))
        .withColumn("nb", explode(nbrs))
        .withColumn("cell_lat", (floor(col("s_lat") / 5.0) + col("nb.dx")).cast("int"))
        .withColumn("cell_lon",
          pmod(floor(col("s_lon") / 10.0).cast("int") + col("nb.dy") + 36, lit(36)))
        .drop("nb")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"),
          latOf(col("c_custkey")).as("c_lat"), lonOf(col("c_custkey")).as("c_lon"))
        .withColumn("c_radlat", radians(col("c_lat")))
        .withColumn("c_coslat", cos(col("c_radlat")))
        .withColumn("cell_lat", floor(col("c_lat") / 5.0).cast("int"))
        .withColumn("cell_lon",
          pmod(floor(col("c_lon") / 10.0).cast("int") + 36, lit(36)))
      // Bounding-box prefilter: the 3×3 cell neighborhood admits pairs
      // up to 15° lat / 30° lon apart, but R=500 km bounds a qualifying
      // pair by 4.50° lat and 8.99° lon (scaladoc derivation) — two
      // cheap comparisons discard most candidates before the trig; the
      // brute-force oracle proves no pair is lost.
      val dLon = abs(col("c_lon") - col("s_lon"))
      // Haversine km, rounded to 2 decimals on BOTH engines so the
      // radius predicate evaluates on the same quantized value; the
      // least(1, a) clamp keeps asin in range when rounding pushes the
      // sin/cos composition an ulp above 1. radians(a-b) vs
      // radians(a)-radians(b) differ in ulps only; the 2-decimal
      // quantization (oracle-matched at sf0.01/0.1) absorbs it.
      val sdLat = sin((col("s_radlat") - col("c_radlat")) / 2)
      val sdLon = sin(radians(col("s_lon") - col("c_lon")) / 2)
      val hav = sdLat * sdLat + col("c_coslat") * col("s_coslat") * sdLon * sdLon
      val km = roundTo(lit(2 * 6371.0) * asin(sqrt(least(lit(1.0), hav))), 2)
      cust.join(broadcast(sup), Seq("cell_lat", "cell_lon"))
        .filter(abs(col("c_lat") - col("s_lat")) <= lit(4.51) &&
          least(dLon, lit(360.0) - dLon) <= lit(9.0))
        .withColumn("km", km)
        .filter(col("km") < RadiusKm)
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_within"), min("km").as("min_km"))
        .orderBy("c_custkey")
    },
    Some(s"""WITH c AS (
           |  SELECT c_custkey,
           |    -60.0 + (c_custkey * 37 % 1200) / 10.0 AS lat,
           |    -180.0 + (c_custkey * 91 % 3600) / 10.0 AS lon
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |    -60.0 + (s_suppkey * 37 % 1200) / 10.0 AS lat,
           |    -180.0 + (s_suppkey * 91 % 3600) / 10.0 AS lon
           |  FROM supplier),
           |p AS (
           |  SELECT c.c_custkey, $haversineSql AS km
           |  FROM c CROSS JOIN s)
           |SELECT c_custkey, count(*) AS n_within, min(km) AS min_km
           |FROM p WHERE km < $RadiusKm
           |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin))

  val all: Seq[QueryDef] = Seq(radiusJoin)
}
