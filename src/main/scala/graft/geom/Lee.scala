package graft.geom

import Polyhedral._

/**
 * Rectangular conformal tetrahedral projections — the reference's `markley`
 * and `calm` (`/root/reference/src/crs/mapshaper-lee-tetrahedral.mjs`;
 * L. P. Lee's conformal triangle transform and the tetrahedral net follow
 * d3-geo-polygon's published implementation; the rectangular layout is
 * F. Landis Markley's repeated-face construction).
 *
 * Forward: the 4-face tetrahedral Lee net unfolds through [[Polyhedral]],
 * is normalized to an 8-unit-wide triangle strip, and four affine copies of
 * the strip tile a 8 x 2*sqrt(3) rectangle (two straight cuts pick the copy,
 * an x-phase wrap slides the aspect). Conformal except at the four vertex
 * singularities (placed in oceans by both published aspects).
 */
object Lee {

  private final val R2D = 180.0 / math.Pi
  private val Sqrt2 = math.sqrt(2)
  private val Sqrt3 = math.sqrt(3)
  private val AsinOneThird = math.asin(1.0 / 3)
  private val MarkleyLatitude = math.acos(1.0 / 3) * 0.5 * R2D
  private val LayoutPeriod = 8.0
  private val RectXMin = -7.0
  private val RectXMax = 1.0
  private val RectYMin = -2 * Sqrt3
  private val RectYMax = 0.0

  // ------------------------------------------------------- complex helpers

  @inline private def cMul(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 * b._1 - a._2 * b._2, a._2 * b._1 + a._1 * b._2)

  @inline private def cAdd(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  @inline private def cSub(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 - b._1, a._2 - b._2)

  @inline private def cNorm(a: (Double, Double)): Double = math.hypot(a._1, a._2)

  private def cPow(v: (Double, Double), n: (Double, Double)): (Double, Double) = {
    val (a, b) = v
    if (a == 0 && b == 0) return (0.0, 0.0)
    if (n._2 == 0 && b == 0 && a >= 0) return (math.pow(a, n._1), 0.0)
    val arg = math.atan2(b, a)
    val logNorm = math.log(math.hypot(a, b))
    val magnitude = math.exp(n._1 * logNorm - n._2 * arg)
    val angle = n._2 * logNorm + n._1 * arg
    (magnitude * math.cos(angle), magnitude * math.sin(angle))
  }

  private def stereographicRaw(lam: Double, phi: Double): (Double, Double) = {
    val cosPhi = math.cos(phi)
    val k = 1.0 / (1.0 + cosPhi * math.cos(lam))
    (k * cosPhi * math.sin(lam), k * math.sin(phi))
  }

  // ------------------------------------------------------------ Lee raw

  /** Lee's conformal map of a stereographic triangle onto a planar triangle:
   * three 120-degree sectors; a vertex-centered series (k) and a
   * center-series (h) blended on the 0.3..0.5 annulus. */
  def leeRaw(lam: Double, phi: Double): (Double, Double) = {
    val w = (-0.5, Sqrt3 / 2)
    val z = cMul(stereographicRaw(lam, phi), (Sqrt2, 0.0))
    val powers = Array(cPow(w, (0.0, 0.0)), cPow(w, (1.0, 0.0)), cPow(w, (2.0, 0.0)))
    var sector = 0
    var i = 1
    while (i < 3) {
      if (cMul(z, powers(i))._1 > cMul(z, powers(sector))._1) sector = i
      i += 1
    }
    val rot = powers(sector)
    val n = cNorm(z)
    var h = (0.0, 0.0)
    var k = (0.0, 0.0)

    if (n > 0.3) {
      val y = cSub((1.0, 0.0), cMul(rot, z))
      val w1 = 1.4021821053254548
      val coefficients = Array(
        1.15470053837925, 0.192450089729875, 0.0481125224324687,
        0.010309826235529, 3.34114739114366e-4, -1.50351632601465e-3,
        -1.2304417796231e-3, -6.75190201960282e-4,
        -2.84084537293856e-4, -8.21205120500051e-5,
        -1.59257630018706e-6, 1.91691805888369e-5,
        1.73095888028726e-5, 1.03865580818367e-5,
        4.70614523937179e-6, 1.4413500104181e-6,
        1.92757960170179e-8, -3.82869799649063e-7,
        -3.57526015225576e-7, -2.2175964844211e-7)
      var g = (0.0, 0.0)
      var j = coefficients.length - 1
      while (j >= 0) {
        g = cAdd((coefficients(j), 0.0), cMul(g, y))
        j -= 1
      }
      k = cSub((w1, 0.0), cMul(cPow(y, (0.5, 0.0)), g))
      k = cMul(cMul(k, rot), rot)
    }

    if (n < 0.5) {
      val h0 = Array(1.0, 1.0 / 8, 3.0 / 56, 1.0 / 32, 35.0 / 1664, 63.0 / 4096, 231.0 / 19456)
      val z3 = cPow(z, (3.0, 0.0))
      var j = h0.length - 1
      while (j >= 0) {
        h = cAdd((h0(j), 0.0), cMul(h, z3))
        j -= 1
      }
      h = cMul(h, z)
    }

    if (n < 0.3) h
    else if (n > 0.5) k
    else {
      val t = (n - 0.3) / 0.2
      cAdd(cMul(k, (t, 0.0)), cMul(h, (1.0 - t, 0.0)))
    }
  }

  /** Damped-Newton inverse of leeRaw (the reference's invertLeeRaw). */
  def invertLeeRaw(x: Double, y: Double): Option[(Double, Double)] = {
    var lam = x
    var phi = y * 0.5
    var da = 0.0
    var db = 0.0
    var err2 = Double.PositiveInfinity
    val eps = 1e-12
    var i = 0
    var break = false
    while (i < 40 && !break) {
      val q = leeRaw(lam, phi)
      val tx = q._1 - x
      val ty = q._2 - y
      if (math.abs(tx) < eps && math.abs(ty) < eps) break = true
      else {
        val error = tx * tx + ty * ty
        if (error > err2) {
          da /= 2; lam -= da
          db /= 2; phi -= db
        } else {
          err2 = error
          val ea = (if (lam > 0) -1 else 1) * eps
          val eb = (if (phi > 0) -1 else 1) * eps
          val qa = leeRaw(lam + ea, phi)
          val qb = leeRaw(lam, phi + eb)
          val dxa = (qa._1 - q._1) / ea
          val dya = (qa._2 - q._2) / ea
          val dxb = (qb._1 - q._1) / eb
          val dyb = (qb._2 - q._2) / eb
          val det = dyb * dxa - dya * dxb
          if (math.abs(det) < 1e-14) break = true
          else {
            val scale = (if (math.abs(det) < 0.5) 0.5 else 1.0) / det
            da = (ty * dxb - tx * dyb) * scale
            db = (tx * dya - ty * dxa) * scale
            lam += da
            phi += db
            if (math.abs(da) < eps && math.abs(db) < eps) break = true
          }
        }
      }
      i += 1
    }
    val check = leeRaw(lam, phi)
    if (math.hypot(check._1 - x, check._2 - y) < 1e-8) Some((lam, phi)) else None
  }

  private final class LeeProjector(rot: Array[Double]) extends FaceProjector {
    def project(lam: Double, phi: Double): (Double, Double) = {
      val (l, p) = rotateSphericalRadians(lam, phi, rot)
      val q = leeRaw(l, p)
      (q._1, -q._2)
    }
    def invert(x: Double, y: Double): Option[(Double, Double)] =
      invertLeeRaw(x, -y).map { case (l, p) =>
        rotateSphericalRadians(l, p, rot, invert = true)
      }
  }

  // ------------------------------------------------------------- engines

  private val Vertices = Array(
    Array(0.0, 90.0),
    Array(-180.0, -AsinOneThird * R2D),
    Array(-60.0, -AsinOneThird * R2D),
    Array(60.0, -AsinOneThird * R2D))

  private val FaceIdx = Array(Array(1, 2, 3), Array(0, 2, 1), Array(0, 3, 2), Array(0, 1, 3))

  /** (id, matrix) of the four affine net copies tiling the frame. */
  private val LayoutCopies: Array[(Int, Array[Double])] = Array(
    (0, Array(1.0, 0, 0, 0, -1, 0)),
    (1, Array(-1.0, 0, -4, 0, 1, 0)),
    (2, Array(1.0, 0, -8, 0, -1, 0)),
    (3, Array(-1.0, 0, 4, 0, 1, 0)))

  private def centroidOf(face: Array[Array[Double]]): Array[Double] =
    Polyhedral.sphericalCentroidDeg(face)

  final class LeeEngine(rotationDeg: Array[Double], layoutPhase: Double) extends Serializable {
    val base: Engine = {
      val faces = FaceIdx.map(_.map(Vertices(_)))
      new Engine(faces, faces.map(centroidOf), Array(-1, 0, 0, 0), rotationDeg,
        angleDeg = 30,
        face => {
          val c = face.centroidDeg
          val rot = if (math.abs(c(1)) == 90) Array(0.0, -c(1), -30.0)
            else Array(-c(0), -c(1), 30.0)
          new LeeProjector(rot)
        })
    }

    // normalize the base net to 8 units wide, y flipped (screen orientation)
    private val (ncx, ncy, nscale) = {
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      base.outline.foreach(_.foreach { p =>
        xmin = math.min(xmin, p(0)); ymin = math.min(ymin, p(1))
        xmax = math.max(xmax, p(0)); ymax = math.max(ymax, p(1))
      })
      ((xmin + xmax) / 2, (ymin + ymax) / 2, 8.0 / (xmax - xmin))
    }

    private def layoutCopy(px: Double, py: Double): (Int, Array[Double]) =
      if (py >= 0) { if (px > 3) LayoutCopies(2) else LayoutCopies(0) }
      else { if (px > 1) LayoutCopies(3) else LayoutCopies(1) }

    /** Normalize a base-net point and place it in the rectangular layout —
     * ONE implementation shared by forward and regionKey, so seam-cut
     * region boundaries coincide exactly with forward's discontinuities.
     * Returns (copyId, wrapShiftCount, wrappedX, y). */
    private def layoutState(bx: Double, by: Double): (Int, Int, Double, Double) = {
      val px = (bx - ncx) * nscale
      val py = -(by - ncy) * nscale
      val (copyId, m) = layoutCopy(px, py)
      var x = m(0) * px + m(1) * py + m(2) + layoutPhase
      val qy = m(3) * px + m(4) * py + m(5)
      var k = 0
      while (x < RectXMin) { x += LayoutPeriod; k += 1 }
      while (x > RectXMax) { x -= LayoutPeriod; k -= 1 }
      (copyId, k, x, qy)
    }

    def forward(lam: Double, phi: Double): Option[(Double, Double)] =
      base.forward(lam, phi).map { case (bx, by) =>
        val (_, _, qx, qy) = layoutState(bx, by)
        (math.max(RectXMin, math.min(RectXMax, qx)) - (RectXMin + RectXMax) / 2,
          math.max(RectYMin, math.min(RectYMax, qy)) - (RectYMin + RectYMax) / 2)
      }

    /** Region id of the continuous layout piece containing a direction:
     * (base face, layout copy, x-wrap shift). The projected map is
     * continuous within a region; paths crossing regions must be cut. */
    def regionKey(lam: Double, phi: Double): Int =
      base.faceLocal(lam, phi) match {
        case None => -1
        case Some((faceId, _, _)) =>
          val (bx, by) = base.forward(lam, phi).get
          val (copyId, k, _, _) = layoutState(bx, by)
          ((faceId * 4) + copyId) * 5 + (k + 2)
      }

    /** Inverse by copy x wrap-candidate scan + per-face Newton (the
     * reference keeps this internal; exposed here for round-trip specs). */
    def inverse(x: Double, y: Double): Option[(Double, Double)] = {
      val qx = x + (RectXMin + RectXMax) / 2
      val qy = y + (RectYMin + RectYMax) / 2
      for ((copyId, m) <- LayoutCopies; k <- Seq(0.0, LayoutPeriod, -LayoutPeriod)) {
        val ux = qx - layoutPhase + k
        val det = m(0) * m(4) - m(1) * m(3)
        val px = (m(4) * (ux - m(2)) - m(1) * (qy - m(5))) / det
        val py = (-m(3) * (ux - m(2)) + m(0) * (qy - m(5))) / det
        if (layoutCopy(px, py)._1 == copyId) {
          val bx = px / nscale + ncx
          val by = -(py / nscale) + ncy
          base.inverse(bx, by) match {
            case Some((lam, phi)) =>
              forward(lam, phi) match {
                case Some((cx, cy)) if math.hypot(cx - x, cy - y) < 1e-6 =>
                  return Some((lam, phi))
                case _ =>
              }
            case None =>
          }
        }
      }
      None
    }
  }

  /** Markley conformal tetrahedral world map (singularities at ±35.26° in
   * oceans). */
  lazy val markley: LeeEngine =
    new LeeEngine(Array(115.0, MarkleyLatitude - 90.0, 180.0), layoutPhase = -2.0)

  /** CALM — Conformal Authagraph-Like Map (Kunimune's published aspect). */
  lazy val calm: LeeEngine =
    new LeeEngine(Array(64.7261399569101, -39.84470062116125, -119.02303523591051),
      layoutPhase = -1.5)
}
