package graft.geom

import Polyhedral._

/**
 * Buckminster Fuller's Airocean (Dymaxion) icosahedral layout — the
 * reference's `-proj dymaxion` / `dymaxion2`
 * (`/root/reference/src/crs/mapshaper-dymaxion.mjs`; face layout and the
 * Gray-Fuller facet transform follow the published d3-geo-polygon airocean
 * arrangement and Robert W. Gray's equations).
 *
 * 20 icosahedron faces; three are split (faces 15, 14, 19) into 24 so
 * Australia/Japan and the poles unfold without cutting land. Face sites
 * (local projection centers) are the PRE-split triangle centroids.
 */
object Dymaxion {

  private final val D2R = math.Pi / 180.0
  private final val R2D = 180.0 / math.Pi
  private val SQRT3 = math.sqrt(3)
  private val GrayZ = math.sqrt(5 + 2 * math.sqrt(5)) / math.sqrt(15)
  private val GrayEl = math.sqrt(8) / math.sqrt(5 + math.sqrt(5))
  private val GrayDve = math.sqrt(3 + math.sqrt(5)) / math.sqrt(5 + math.sqrt(5))

  private val Rotation = Array(-83.65929, 25.44458, -87.45184)
  private val Parents = Array(
    -1, 0, 1, 11, 13,
    6, 7, 1, 7, 8,
    9, 10, 11, 12, 13,
    6, 8, 10, 17, 21,
    16, 15, 19, 19)

  // ------------------------------------------------------ face construction
  // vector algebra shared with the other solids lives in [[Polyhedral]]

  private def sphericalCentroid(coords: Array[Array[Double]]): Array[Double] =
    Polyhedral.sphericalCentroidDeg(coords)

  private def greatCircleMidpoint(a: Array[Double], b: Array[Double]): Array[Double] = {
    val av = Polyhedral.degreesToVector(a(0), a(1))
    val bv = Polyhedral.degreesToVector(b(0), b(1))
    Polyhedral.vectorToDegreesArr(Polyhedral.normalize(
      Array(av(0) + bv(0), av(1) + bv(1), av(2) + bv(2))))
  }

  /** Icosahedron faces + the airocean splits; (faces, sites). */
  private def airoceanFaces(): (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val theta = math.atan(0.5) * R2D
    val vertices = Array(Array(0.0, 90.0), Array(0.0, -90.0)) ++
      (0 until 10).map { i =>
        Array((((i * 36 + 180) % 360) - 180).toDouble, if ((i & 1) != 0) theta else -theta)
      }
    val idx = Array(
      Array(0, 3, 11), Array(0, 5, 3), Array(0, 7, 5), Array(0, 9, 7), Array(0, 11, 9),
      Array(2, 11, 3), Array(3, 4, 2), Array(4, 3, 5), Array(5, 6, 4), Array(6, 5, 7),
      Array(7, 8, 6), Array(8, 7, 9), Array(9, 10, 8), Array(10, 9, 11), Array(11, 2, 10),
      Array(1, 2, 4), Array(1, 4, 6), Array(1, 6, 8), Array(1, 8, 10), Array(1, 10, 2))
    val faces = scala.collection.mutable.ArrayBuffer(
      idx.map(_.map(vertices(_))): _*)
    val sites = scala.collection.mutable.ArrayBuffer(
      faces.map(f => sphericalCentroid(f)).toSeq: _*)

    // split face 15 at its own site into three
    var original = faces(15).clone()
    var site = sites(15)
    faces(15) = faces(15).clone()
    faces(15)(0) = site
    faces += Array(original(0), site, original(2)); sites += site
    faces += Array(original(0), original(1), site); sites += site

    // split faces 14 and 19 at the shared great-circle midpoint
    original = faces(14).clone()
    site = sites(14)
    val mid = greatCircleMidpoint(faces(14)(1), faces(14)(2))
    faces(14) = faces(14).clone()
    faces(14)(1) = mid
    faces += Array(original(0), original(1), mid); sites += site

    original = faces(19).clone()
    site = sites(19)
    faces(19) = faces(19).clone()
    faces(19)(1) = mid
    faces += Array(mid, original(0), original(1)); sites += site

    (faces.toArray, sites.toArray)
  }

  // --------------------------------------------------------- face projectors

  /** Gray-Fuller facet transform (equal-ish area within each triangle). */
  def grayFullerRaw(lam: Double, phi: Double): (Double, Double) = {
    val cosPhi = math.cos(phi)
    val s = GrayZ / (cosPhi * math.cos(lam))
    val x = cosPhi * math.sin(lam) * s
    val y = math.sin(phi) * s
    val a1p = math.atan2(2 * y / SQRT3 + GrayEl / 3 - GrayEl / 2, GrayDve)
    val a2p = math.atan2(x - y / SQRT3 + GrayEl / 3 - GrayEl / 2, GrayDve)
    val a3p = math.atan2(GrayEl / 3 - x - y / SQRT3 - GrayEl / 2, GrayDve)
    (SQRT3 * (a2p - a3p), 2 * a1p - a2p - a3p)
  }

  /** Local rotation centering the face site; `direction` keeps two rows of
   * facets upright in the published airocean sheet. */
  private def faceRotation(centroid: Array[Double], grayFuller: Boolean): Array[Double] = {
    val direction =
      if (grayFuller &&
        (math.abs(centroid(1) - 52.62) < 1 || math.abs(centroid(1) + 10.81) < 1)) 0.0
      else if (grayFuller) 60.0
      else 0.0
    Array(-centroid(0), -centroid(1), direction)
  }

  private final class GrayFullerProjector(rot: Array[Double]) extends FaceProjector {
    def project(lam: Double, phi: Double): (Double, Double) = {
      val (l, p) = rotateSphericalRadians(lam, phi, rot)
      val (qx, qy) = grayFullerRaw(l, p)
      (qx, -qy) // screen-oriented local y (matches the published matrices)
    }
    /** Numeric inverse: Newton on the smooth 2D forward, gnomonic seed. */
    def invert(x: Double, y: Double): Option[(Double, Double)] = {
      // gnomonic first guess: grayFullerRaw ~ identity-scaled near center
      var lam = x / 2.0
      var phi = -y / 2.0
      var i = 0
      while (i < 25) {
        val (fx, fy) = { val q = grayFullerRaw(lam, phi); (q._1, -q._2) }
        val ex = fx - x; val ey = fy - y
        if (math.abs(ex) < 1e-12 && math.abs(ey) < 1e-12) {
          return Some(rotateSphericalRadians(lam, phi, rot, invert = true))
        }
        val h = 1e-7
        val (fxl, fyl) = { val q = grayFullerRaw(lam + h, phi); (q._1, -q._2) }
        val (fxp, fyp) = { val q = grayFullerRaw(lam, phi + h); (q._1, -q._2) }
        val j00 = (fxl - fx) / h; val j01 = (fxp - fx) / h
        val j10 = (fyl - fy) / h; val j11 = (fyp - fy) / h
        val det = j00 * j11 - j01 * j10
        if (det == 0 || det.isNaN) return None
        lam -= (j11 * ex - j01 * ey) / det
        phi -= (-j10 * ex + j00 * ey) / det
        i += 1
      }
      None
    }
  }

  private final class GnomonicProjector(rot: Array[Double]) extends FaceProjector {
    def project(lam: Double, phi: Double): (Double, Double) = {
      val (l, p) = rotateSphericalRadians(lam, phi, rot)
      val cosPhi = math.cos(p)
      val k = cosPhi * math.cos(l)
      (cosPhi * math.sin(l) / k, -math.sin(p) / k)
    }
    def invert(x: Double, y: Double): Option[(Double, Double)] = {
      val rho = math.sqrt(x * x + y * y)
      val c = math.atan(rho)
      val sinC = math.sin(c); val cosC = math.cos(c)
      val phi = if (rho == 0) 0.0 else math.asin(-y * sinC / rho)
      val lam = math.atan2(x * sinC, rho * cosC)
      Some(rotateSphericalRadians(lam, phi, rot, invert = true))
    }
  }

  // ------------------------------------------------------------------ engines

  /** `dymaxion` — Gray-Fuller facets (the classic Fuller map). */
  lazy val fuller: Engine = build(grayFuller = true)

  /** `dymaxion2` — gnomonic facets. */
  lazy val gnomonic: Engine = build(grayFuller = false)

  private def build(grayFuller: Boolean): Engine = {
    val (faces, sites) = airoceanFaces()
    new Engine(faces, sites, Parents, Rotation, angleDeg = -60,
      face =>
        if (grayFuller) new GrayFullerProjector(faceRotation(face.centroidDeg, grayFuller = true))
        else new GnomonicProjector(faceRotation(face.centroidDeg, grayFuller = false)))
  }
}
