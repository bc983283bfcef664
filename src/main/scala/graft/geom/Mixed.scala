package graft.geom

/**
 * Generic mixed (compound) projection — the reference's `MixedProjection`
 * (`/root/reference/src/crs/mapshaper-mixed-projection.mjs`): an ordered
 * list of frames, each a projection plus a lat/lon routing bbox and an
 * affine placement (rotate and scale about the frame origin's projected
 * position, then translate so the origin lands on its placement point).
 * A point projects through the FIRST frame whose bbox contains it; points
 * outside every frame map to (∞, ∞). The built-in `albersusa` composite is
 * the fixed-frame instance of this machinery; `MixedProj` exposes it for
 * user-defined insets ("savvy users" surface in the reference).
 *
 * Purely per-row arithmetic over a short frame list — broadcast-safe and
 * constant-time per point on Spark.
 */
object Mixed {

  /** Affine accumulator with the reference Matrix2D's exact op semantics
   * (rotate-about then scale-about then translate compose in call order). */
  final class Matrix2D extends Serializable {
    var a = 1.0; var c = 0.0; var tx = 0.0
    var b = 0.0; var d = 1.0; var ty = 0.0

    def transform(x: Double, y: Double): (Double, Double) =
      (x * a + y * c + tx, x * b + y * d + ty)

    def translate(dx: Double, dy: Double): Unit = { tx += dx; ty += dy }

    def rotate(q: Double, x: Double, y: Double): Unit = {
      val cos = math.cos(q); val sin = math.sin(q)
      a = cos; c = -sin
      b = sin; d = cos
      tx += x - x * cos + y * sin
      ty += y - x * sin - y * cos
    }

    def scale(sx: Double, sy: Double, cx: Double, cy: Double): Unit = {
      a *= sx; c *= sx
      b *= sy; d *= sy
      tx -= cx * (sx - 1)
      ty -= cy * (sy - 1)
    }
  }

  /**
   * One frame of a mixed projection.
   *
   * @param proj      projection for points routed to this frame
   * @param bbox      (lonMin, latMin, lonMax, latMax) routing box, degrees
   * @param origin    unprojected origin (lon, lat) the placement refers to
   * @param placement projected coordinates where the origin should land
   * @param dx,dy     extra shift, meters
   * @param scale     scale factor about the projected origin
   * @param rotationDeg rotation about the projected origin, degrees
   */
  final case class Frame(proj: Crs.Proj,
                         bbox: (Double, Double, Double, Double),
                         origin: Option[(Double, Double)] = None,
                         placement: Option[(Double, Double)] = None,
                         dx: Double = 0.0, dy: Double = 0.0,
                         scale: Double = 1.0, rotationDeg: Double = 0.0) {
    private[Mixed] val matrix: Matrix2D = {
      val m = new Matrix2D
      val (ox, oy) = origin match {
        case Some((lon, lat)) => proj.forward(lon, lat)
        case None => (0.0, 0.0)
      }
      val (px, py) = placement.getOrElse((0.0, 0.0))
      if (rotationDeg != 0) m.rotate(rotationDeg * math.Pi / 180.0, ox, oy)
      if (scale != 1.0) m.scale(scale, scale, ox, oy)
      m.translate(px - ox + dx, py - oy + dy)
      m
    }

    def contains(lonDeg: Double, latDeg: Double): Boolean = {
      val (lonMin, latMin, lonMax, latMax) = bbox
      lonDeg >= lonMin && lonDeg <= lonMax && latDeg >= latMin && latDeg <= latMax
    }

    /** The composed placement affine (a, b, c, d, tx, ty) — read-only view
     * for mirrors/exports that need the frame constants. */
    def affine: (Double, Double, Double, Double, Double, Double) =
      (matrix.a, matrix.b, matrix.c, matrix.d, matrix.tx, matrix.ty)

    /** Undo the placement affine (projected output → the frame CRS's own
     * coordinates) — the building block for frame-wise inverses
     * ([[Crs.AlbersUsa]] routes through this). */
    def inverseTransform(x: Double, y: Double): (Double, Double) = {
      val m = matrix
      val det = m.a * m.d - m.c * m.b
      ((m.d * (x - m.tx) - m.c * (y - m.ty)) / det,
        (-m.b * (x - m.tx) + m.a * (y - m.ty)) / det)
    }
  }

  /** Frame-local forward: project then place (used by [[Crs.MixedProj]]). */
  private[geom] def forwardThrough(f: Frame, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val (x, y) = f.proj.forward(lonDeg, latDeg)
    f.matrix.transform(x, y)
  }

  /** Convenience: a main projection covering `bbox` plus inset frames. */
  def apply(main: Crs.Proj, mainBbox: (Double, Double, Double, Double),
            insets: Frame*): Crs.MixedProj =
    Crs.MixedProj(Frame(main, mainBbox) +: insets.toVector)
}
