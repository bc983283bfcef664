package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Minimal CRS support: lon/lat ↔ spherical (Web) Mercator — the slice of the
 * reference's `-proj` machinery (`/root/reference/src/commands/mapshaper-proj.mjs`,
 * bundled mproj) that the tiling engine needs (tile pyramids are WebMercator).
 * Pure column math — codegen end to end.
 */
object Proj {

  final val R = 6378137.0 // WGS84 semi-major axis (public constant)

  def lonToMercX(lon: Column): Column = lon * (math.Pi / 180.0) * R

  def latToMercY(lat: Column): Column =
    log(tan(lit(math.Pi / 4.0) + lat * (math.Pi / 180.0) / 2.0)) * R

  def mercXToLon(x: Column): Column = x / R * (180.0 / math.Pi)

  def mercYToLat(y: Column): Column =
    (atan(exp(y / R)) * 2.0 - math.Pi / 2.0) * (180.0 / math.Pi)

  // ---- full CRS forwards (codegen expression over graft.geom.Crs) --------

  /** Project lon/lat columns through any [[graft.geom.Crs.Proj]]:
   * returns array<double>[x, y]. */
  def forward(lon: Column, lat: Column, proj: graft.geom.Crs.Proj): Column =
    graft.functions.SpatialExprs.crsForward(lon, lat, proj)

  /** Web-Mercator tile (z/x/y) of a lon/lat point — the tile-pyramid key. */
  def tileX(lon: Column, z: Int): Column =
    floor((lon + 180.0) / 360.0 * (1 << z)).cast("long")

  def tileY(lat: Column, z: Int): Column = {
    val latRad = lat * (math.Pi / 180.0)
    floor((lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / math.Pi) / 2.0 * (1 << z)).cast("long")
  }
}
