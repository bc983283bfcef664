package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geom.Crs

/**
 * Spherical pre-projection clipping — the reference's `preProjectionClip`
 * (`/root/reference/src/crs/mapshaper-spherical-clipping.mjs:20-44` +
 * `mapshaper-proj-extents.mjs:207-262`): before projecting lon/lat content,
 *
 *  - restricted-range CRSs (merc, lcc) CLAMP coordinates into a bbox;
 *  - azimuthal projections (ortho/gnom/laea/stere) CLIP to a small circle
 *    of the projection's default clip angle around its center;
 *  - rotated normal-aspect projections CUT paths at the rotated
 *    antimeridian (lon0 ± 180°) so nothing wraps across the map edge.
 *
 * All kernels are deterministic; the circle boundary is found by fixed-count
 * bisection on the true great-circle distance (the reference clips against a
 * densified polygon approximation of the same circle).
 */
object SphericalClip {

  /** cos of the great-circle angle between (lon,lat) and (lon0,lat0). */
  def cosAngular(lonDeg: Double, latDeg: Double, lon0Deg: Double, lat0Deg: Double): Double = {
    val phi = latDeg * Crs.D2R; val phi0 = lat0Deg * Crs.D2R
    val dl = (lonDeg - lon0Deg) * Crs.D2R
    math.sin(phi0) * math.sin(phi) + math.cos(phi0) * math.cos(phi) * math.cos(dl)
  }

  /** Column form of [[cosAngular]] — same op order for oracle mirrors. */
  def cosAngularCol(lon: Column, lat: Column, lon0Deg: Double, lat0Deg: Double): Column = {
    val phi = lat * (math.Pi / 180.0); val phi0 = lat0Deg * Crs.D2R
    val dl = (lon - lon0Deg) * (math.Pi / 180.0)
    lit(math.sin(phi0)) * sin(phi) + lit(math.cos(phi0)) * cos(phi) * cos(dl)
  }

  /** Point keep-predicate for a clip spec (points have no cut case). */
  def pointKeep(lon: Column, lat: Column, spec: Crs.ClipSpec): Column = spec match {
    case Crs.ClipCircle(lon0, lat0, angle) =>
      cosAngularCol(lon, lat, lon0, lat0) >= lit(math.cos(angle * Crs.D2R))
    case Crs.ClampBBox(_, _, _, _) | Crs.CutAtAntimeridian(_, _) | Crs.NoClip |
         Crs.CutAtFaceSeams(_) => lit(true) // seam cuts apply to paths only
  }

  /** Clamp a flat lon/lat path into a bbox (the reference's clampDataset —
    * per-vertex clamp, not a clip). */
  def clampPath(flat: Array[Double], b: Crs.ClampBBox): Array[Double] = {
    val out = new Array[Double](flat.length)
    var i = 0
    while (i < flat.length) {
      out(i) = math.max(b.minLon, math.min(b.maxLon, flat(i)))
      out(i + 1) = math.max(b.minLat, math.min(b.maxLat, flat(i + 1)))
      i += 2
    }
    out
  }

  /** Cut a lon/lat path at a meridian: planar vertical-line split with
    * linear interpolation at the crossing (the reference inserts the cut
    * vertex via editArcs, `mapshaper-spherical-clipping.mjs:95-130`).
    * Returns the path parts in traversal order. */
  def cutAtLon(flat: Array[Double], cutLon: Double): Seq[Array[Double]] = {
    if (flat.length < 2) return Seq.empty
    val parts = Seq.newBuilder[Array[Double]]
    var cur = Array.newBuilder[Double]
    cur += flat(0); cur += flat(1)
    var i = 0
    while (i + 3 < flat.length) {
      val x1 = flat(i); val y1 = flat(i + 1)
      val x2 = flat(i + 2); val y2 = flat(i + 3)
      val d1 = x1 - cutLon; val d2 = x2 - cutLon
      if ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) {
        val t = (cutLon - x1) / (x2 - x1)
        val cy = y1 + t * (y2 - y1)
        cur += cutLon; cur += cy
        parts += cur.result()
        cur = Array.newBuilder[Double]
        cur += cutLon; cur += cy
      }
      cur += x2; cur += y2
      i += 2
    }
    parts += cur.result()
    parts.result()
  }

  /** Clip a lon/lat path to the small circle (center, angle): keeps the
    * sub-paths whose points satisfy cosAngular >= cos(angle); boundary
    * crossings located by 40-round bisection of the crossing segment
    * (deterministic). */
  def clipPathToCircle(flat: Array[Double], lon0: Double, lat0: Double,
                       angleDeg: Double): Seq[Array[Double]] = {
    val cosLimit = math.cos(angleDeg * Crs.D2R)
    def in(x: Double, y: Double): Boolean = cosAngular(x, y, lon0, lat0) >= cosLimit
    def boundary(x1: Double, y1: Double, x2: Double, y2: Double): (Double, Double) = {
      // bisection on t in [0,1] with linear lon/lat interpolation
      var lo = 0.0; var hi = 1.0
      val inLo = in(x1, y1)
      var k = 0
      while (k < 40) {
        val mid = (lo + hi) / 2.0
        val mx = x1 + mid * (x2 - x1); val my = y1 + mid * (y2 - y1)
        if (in(mx, my) == inLo) lo = mid else hi = mid
        k += 1
      }
      val t = (lo + hi) / 2.0
      (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
    }
    val parts = Seq.newBuilder[Array[Double]]
    var cur = Array.newBuilder[Double]
    var have = false
    def flush(): Unit = {
      val a = cur.result()
      if (a.length >= 4) parts += a
      cur = Array.newBuilder[Double]
      have = false
    }
    var i = 0
    while (i + 1 < flat.length) {
      val x1 = flat(i); val y1 = flat(i + 1)
      val isIn = in(x1, y1)
      if (isIn && !have) { cur += x1; cur += y1; have = true }
      else if (isIn) { cur += x1; cur += y1 }
      if (i + 3 < flat.length) {
        val x2 = flat(i + 2); val y2 = flat(i + 3)
        val nextIn = in(x2, y2)
        if (isIn != nextIn) {
          val (bx, by) = boundary(x1, y1, x2, y2)
          cur += bx; cur += by
          if (isIn) flush() // leaving the circle
          else have = true  // entering: boundary point starts the new part
        } else if (!isIn) {
          // both endpoints outside: the segment may still dip through the
          // circle — probe 15 interior samples (the reference's densified
          // clip polygon has comparable resolution); on a hit, bisect both
          // crossings around it and emit the interior sliver
          var hit = -1.0
          var k = 1
          while (k < 16 && hit < 0) {
            val t = k / 16.0
            if (in(x1 + t * (x2 - x1), y1 + t * (y2 - y1))) hit = t
            k += 1
          }
          if (hit >= 0) {
            val mx = x1 + hit * (x2 - x1); val my = y1 + hit * (y2 - y1)
            val (ex, ey) = boundary(x1, y1, mx, my) // entry
            val (lx, ly) = boundary(mx, my, x2, y2) // exit
            cur += ex; cur += ey; cur += lx; cur += ly
            flush()
          }
        }
      }
      i += 2
    }
    flush()
    parts.result()
  }

  /**
   * Cut a lon/lat path wherever a polyhedral projection's region id changes
   * — the projection is continuous within a region and JUMPS across seams,
   * so a segment straddling two regions must be split at the boundary
   * (the role of the reference's `__projection_topology` seam paths).
   * Crossings are located by bisection along the chord (40 halvings ≈ 1e-12
   * of the segment); each part gets its OWN boundary vertex strictly inside
   * its region (the lo-side point closes the outgoing part, the hi-side
   * point opens the next), so plain `Proj.forward` projects every part
   * vertex onto one sheet — no region pinning needed downstream. A segment
   * may cross several seams (corner grazing): the walk resumes from each
   * crossing, bounded by `maxCutsPerSegment`. Segments whose endpoints share
   * a region are not probed internally — pre-densify (PathOps.densify) when
   * vertices are sparse relative to face size.
   */
  def cutAtFaceSeams(flat: Array[Double], region: (Double, Double) => Int,
                     maxCutsPerSegment: Int = 8): Seq[Array[Double]] = {
    if (flat.length < 4) return Seq(flat)
    val parts = Seq.newBuilder[Array[Double]]
    val cur = scala.collection.mutable.ArrayBuffer[Double](flat(0), flat(1))
    var sx = flat(0); var sy = flat(1)
    var f0 = region(sx, sy)
    var i = 2
    while (i < flat.length) {
      val ex = flat(i); val ey = flat(i + 1)
      val fe = region(ex, ey)
      var cuts = 0
      var fs = f0
      while (fe != fs && cuts < maxCutsPerSegment) {
        // boundary between (sx,sy) [region fs] and (ex,ey): first change.
        // invariant: lo-side stays in fs, hi-side stays outside it
        var lo = 0.0; var hi = 1.0
        var it = 0
        while (it < 40) {
          val m = (lo + hi) / 2
          if (region(sx + (ex - sx) * m, sy + (ey - sy) * m) == fs) lo = m else hi = m
          it += 1
        }
        cur += sx + (ex - sx) * lo; cur += sy + (ey - sy) * lo
        parts += cur.toArray
        cur.clear()
        val cx = sx + (ex - sx) * hi; val cy = sy + (ey - sy) * hi
        cur += cx; cur += cy
        val fc = region(cx, cy)
        if (fc == fs) { cuts = maxCutsPerSegment } // no progress: give up on this segment
        else { sx = cx; sy = cy; fs = fc }
        cuts += 1
      }
      cur += ex; cur += ey
      sx = ex; sy = ey; f0 = fe
      i += 2
    }
    parts += cur.toArray
    parts.result().filter(_.length >= 4)
  }

  /** DataFrame form: paths (id, path) pre-clipped per `spec`, exploded to
    * (id, part, path). Clamp keeps one part; cut/clip may split. */
  def prepare(paths: DataFrame, idCol: String, pathCol: String,
              spec: Crs.ClipSpec): DataFrame = {
    val fn: Seq[Double] => Seq[Seq[Double]] = spec match {
      case b: Crs.ClampBBox => p => Seq(clampPath(p.toArray, b).toSeq)
      case Crs.CutAtAntimeridian(cut, clamp) => p => {
        val base = clamp.map(b => clampPath(p.toArray, b)).getOrElse(p.toArray)
        cutAtLon(base, cut).map(_.toSeq)
      }
      case Crs.ClipCircle(lon0, lat0, a) =>
        p => clipPathToCircle(p.toArray, lon0, lat0, a).map(_.toSeq)
      case Crs.CutAtFaceSeams(region) =>
        p => cutAtFaceSeams(p.toArray, region).map(_.toSeq)
      case Crs.NoClip => p => Seq(p)
    }
    val u = udf(fn)
    paths.select(col(idCol).as("id"), posexplode(u(col(pathCol))).as(Seq("part", "path")))
  }
}
