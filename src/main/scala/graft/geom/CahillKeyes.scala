package graft.geom

/**
 * Cahill-Keyes 12-zone octant transform — the reference's `cahill_keyes`
 * butterfly facets (`/root/reference/src/crs/mapshaper-cahill-keyes.mjs`;
 * the algorithm is Gene Keyes' published construction, via Mary Jo Graça's
 * Perl and the d3-geo-polygon port the reference adapts).
 *
 * One octant maps to an "M-profile" region built from straight joints and
 * one circular arc; `forward` places all eight octants (with hemisphere
 * mirroring) in the CK master layout, `forwardFace` keeps the octant-local
 * frame for the polyhedral butterfly unfolding.
 *
 * Everything is closed-form planar arithmetic over constants fixed by
 * `lengthMG` — per-row work is a zone dispatch plus a handful of
 * intersections, so it runs unmodified inside a Spark map.
 */
final class CahillKeyes(mg: Double) extends Serializable {

  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  // ----------------------------------------------------------- construction

  private val lengthMG = mg
  private val k3 = math.sqrt(3)
  private val lengthMA = 0.094 * lengthMG
  private val lengthParallel0to73At0 = lengthMG / 100
  private val lengthParallel73to90At0 =
    (lengthMG - lengthMA - lengthParallel0to73At0 * 73) / 17
  private val sin60 = k3 / 2
  private val cos60 = 0.5
  private val pointM = Array(0.0, 0.0)
  private val pointG = Array(lengthMG, 0.0)
  private val pointN = Array(lengthMG, lengthMG * math.tan(30 * D2R))
  private val pointA = Array(lengthMA, 0.0)
  private val pointB = lineIntersection(pointM, 30, pointA, 45)
  private val lengthAB = dist(pointA, pointB)
  private val lengthMB = dist(pointM, pointB)
  private val lengthMN = dist(pointM, pointN)
  private val lengthNG = dist(pointN, pointG)
  private val pointD = interp(lengthMB, lengthMN, pointN, pointM)
  private val pointF = Array(lengthMG, lengthNG - lengthMB)
  private val pointE = Array(
    pointN(0) - lengthMA * math.sin(30 * D2R),
    pointN(1) - lengthMA * math.cos(30 * D2R))
  private val lengthGF = dist(pointG, pointF)
  private val lengthGFE = lengthGF + lengthAB
  private val deltaMEq = lengthGFE / 45
  private val lengthAP75 = 15 * lengthParallel73to90At0
  private val lengthAP73 = lengthMG - lengthMA - lengthParallel0to73At0 * 73
  private val pointU = Array(
    pointA(0) + lengthAP73 * math.cos(30 * D2R),
    pointA(1) + lengthAP73 * math.sin(30 * D2R))
  private val pointT = lineIntersection(pointU, -60, pointB, 30)

  private val (pointC, radius) = {
    val p73a = parallel73(29)
    val lF = p73a._2
    val lT = lengthTorridSegment(29)
    val lM = lengthMiddleSegment(29)
    val l = 15 * (lT + lM + lF) / 73 - lT
    val pointV = interp(l, lM, jointT(29), jointF(29))
    val cy = (pointV(0) * pointV(0) + pointV(1) * pointV(1) -
      pointD(0) * pointD(0) - pointD(1) * pointD(1)) /
      (2 * (k3 * pointV(0) + pointV(1) - k3 * pointD(0) - pointD(1)))
    val c = Array(k3 * cy, cy)
    (c, dist(c, pointD))
  }

  // -------------------------------------------------------------- forwards

  /** Full CK master layout: spherical radians -> planar (lengthMG units). */
  def forward(lambda: Double, phi: Double): (Double, Double) = {
    val res = ll2mp(lambda * R2D, phi * R2D)
    val xy = mp2xy(res._1, res._2)
    mj2g(xy._1, res._3 * xy._2, res._4)
  }

  /** Continuity-region key of a direction: octant (0..8 incl. the south
   * remap) x meridian side. Derived from the SAME ll2mp outputs that drive
   * the placement (mj2g + the side mirror), so the key changes exactly
   * where the projected position can jump — the octant floor and the %90
   * meridian wrap flip at ulp-DIFFERENT longitudes, and keying on octant
   * alone leaves an FP sliver where placement and region disagree. The side
   * boundary at each octant CENTER meridian is continuous (y = 0 there);
   * cutting at it is benign. */
  def regionKey(lambda: Double, phi: Double): Int = {
    val r = ll2mp(lambda * R2D, phi * R2D)
    r._4 * 3 + (r._3.toInt + 1)
  }

  /** Face-local transform for the butterfly unfolding (octant-local frame,
   * meridian measured from the face center, phi sign by side). */
  def forwardFace(lambda: Double, phi: Double): (Double, Double) = {
    val lon = lambda * R2D
    val side = if (lon < 0) -1.0 else if (lon > 0) 1.0 else 0.0
    val local = mp2xy(math.abs(lon), math.abs(phi * R2D))
    (local._1, side * local._2)
  }

  // --------------------------------------------------------------- zones

  private def ll2mp(lon: Double, lat: Double): (Double, Double, Double, Int) = {
    val south = Array(0, 6, 7, 8, 5)
    var octant = truncate((lon + 180) / 90 + 1).toInt
    var meridian = (lon + 720) % 90 - 45
    val side = if (meridian < 0) -1.0 else if (meridian > 0) 1.0 else 0.0
    meridian = math.abs(meridian)
    if (octant == 5) octant = 1
    if (lat < 0) octant = south(octant)
    (meridian, math.abs(lat), side, octant)
  }

  private def mp2xy(m: Double, p: Double): (Double, Double) = {
    if (m == 0) return if (p >= 75) zoneA(p) else zoneB(p)
    if (p >= 75) return zoneC(m, p)
    if (p == 0) return zoneD(m)
    if (p >= 73 && m <= 30) return zoneE(m, p)
    if (m == 45) {
      return if (p <= 15) zoneF(p)
      else if (p <= 73) zoneG(p)
      else zoneH(m, p)
    }
    if (m <= 29) return zoneI(m, p)
    if (p >= 73) return zoneJ(m, p)
    val lT = lengthTorridSegment(m)
    var hit = circleLineIntersection(pointC, radius, jointT(m), jointF(m))
    val l15 =
      if (hit._1) lT + dist(jointT(m), hit._2)
      else {
        hit = circleLineIntersection(pointC, radius, jointE(m), jointT(m))
        lT - dist(jointT(m), hit._2)
      }
    if (p <= 15) zoneK(m, p, l15) else zoneL(m, p, l15)
  }

  private def zoneA(p: Double) = (pointA(0) + (90 - p) * 104, 0.0)
  private def zoneB(p: Double) = (pointG(0) - p * 100, 0.0)
  private def zoneC(m: Double, p: Double) = radialPoint(pointA, 104 * (90 - p), m)
  private def zoneD(m: Double) = { val e = equator(m); (e(0), e(1)) }
  private def zoneE(m: Double, p: Double) = radialPoint(pointA, 1560 + (75 - p) * 100, m)
  private def zoneF(p: Double) = { val r = interp(p, 15, pointE, pointD); (r(0), r(1)) }
  private def zoneG(p: Double) = { val r = interp(p - 15, 58, pointD, pointT); (r(0), r(1)) }

  private def zoneH(m: Double, p: Double): (Double, Double) = {
    val p75 = parallel75(45)
    val p73 = parallel73(m)._1
    val lF = dist(pointT, pointB)
    val lF75 = dist(pointB, p75)
    val l = (75 - p) * (lF75 + lF) / 2
    val r = if (l <= lF75) interp(l, lF75, p75, pointB)
      else interp(l - lF75, lF, pointB, p73)
    (r(0), r(1))
  }

  private def zoneI(m: Double, p: Double): (Double, Double) = {
    val p73a = parallel73(m)
    val lT = lengthTorridSegment(m)
    val lM = lengthMiddleSegment(m)
    val l = p * (lT + lM + p73a._2) / 73
    val r = if (l <= lT) interp(l, lT, jointE(m), jointT(m))
      else if (l <= lT + lM) interp(l - lT, lM, jointT(m), jointF(m))
      else interp(l - lT - lM, p73a._2, jointF(m), p73a._1)
    (r(0), r(1))
  }

  private def zoneJ(m: Double, p: Double): (Double, Double) = {
    val p75 = parallel75(m)
    val p73a = parallel73(m)
    val lF75 = dist(jointF(m), p75)
    val l = (75 - p) * (lF75 - p73a._2) / 2
    val r = if (l <= lF75) interp(l, lF75, p75, jointF(m))
      else interp(l - lF75, -p73a._2, jointF(m), p73a._1)
    (r(0), r(1))
  }

  private def zoneK(m: Double, p: Double, l15: Double): (Double, Double) = {
    val l = p * l15 / 15
    val lT = lengthTorridSegment(m)
    val lM = lengthMiddleSegment(m)
    val r = if (l <= lT) interp(l, lT, jointE(m), jointT(m))
      else interp(l - lT, lM, jointT(m), jointF(m))
    (r(0), r(1))
  }

  private def zoneL(m: Double, p: Double, l15: Double): (Double, Double) = {
    val p73a = parallel73(m)
    val lT = lengthTorridSegment(m)
    val lM = lengthMiddleSegment(m)
    val lF = p73a._2
    val l = l15 + (p - 15) * (lT + lM + lF - l15) / 58
    val r = if (l <= lT) interp(l, lT, jointE(m), jointF(m))
      else if (l <= lT + lM) interp(l - lT, lM, jointT(m), jointF(m))
      else interp(l - lT - lM, lF, jointF(m), p73a._1)
    (r(0), r(1))
  }

  // --------------------------------------------------------------- joints

  private def equator(m: Double): Array[Double] = {
    val l = deltaMEq * m
    if (l <= lengthGF) Array(pointG(0), l)
    else interp(l - lengthGF, lengthAB, pointF, pointE)
  }

  private def jointE(m: Double): Array[Double] = equator(m)

  private def jointT(m: Double): Array[Double] =
    lineIntersection(pointM, 2 * m / 3, jointE(m), m / 3)

  private def jointF(m: Double): Array[Double] =
    if (m == 0) Array(pointA(0) + lengthAB, 0.0)
    else lineIntersection(pointA, m, pointM, 2 * m / 3)

  private def lengthTorridSegment(m: Double): Double = dist(jointE(m), jointT(m))
  private def lengthMiddleSegment(m: Double): Double = dist(jointT(m), jointF(m))

  /** (point on parallel 73, signed length from jointF). */
  private def parallel73(m: Double): (Array[Double], Double) = {
    val jF = jointF(m)
    if (m <= 30) {
      val p73 = radialPoint2(pointA, lengthAP73, m)
      (p73, dist(jF, p73))
    } else {
      var p73 = lineIntersection(pointT, -60, jF, m)
      var lF = dist(jF, p73)
      if (m > 44) {
        val xy = lineIntersection(pointT, -60, jF, 2 * m / 3)
        if (xy(0) > p73(0)) {
          p73 = xy
          lF = -dist(jF, p73)
        }
      }
      (p73, lF)
    }
  }

  private def parallel75(m: Double): Array[Double] = radialPoint2(pointA, lengthAP75, m)

  // ------------------------------------------------------- octant placement

  private def mj2g(x: Double, y: Double, octant: Int): (Double, Double) = octant match {
    case 0 => rot60(x, y)
    case 1 => val r = rot120(x, y); (r._1 - lengthMG, r._2)
    case 2 => val r = rot60(x, y); (r._1 - lengthMG, r._2)
    case 3 => val r = rot120(x, y); (r._1 + lengthMG, r._2)
    case 4 => val r = rot60(x, y); (r._1 + lengthMG, r._2)
    case 5 => val r = rot60(2 * lengthMG - x, y); (r._1 + lengthMG, r._2)
    case 6 => val r = rot120(2 * lengthMG - x, y); (r._1 - lengthMG, r._2)
    case 7 => val r = rot60(2 * lengthMG - x, y); (r._1 - lengthMG, r._2)
    case 8 => val r = rot120(2 * lengthMG - x, y); (r._1 + lengthMG, r._2)
    case _ => (Double.NaN, Double.NaN)
  }

  private def rot60(x: Double, y: Double): (Double, Double) =
    (x * cos60 + y * sin60, -x * sin60 + y * cos60)

  private def rot120(x: Double, y: Double): (Double, Double) =
    (-x * cos60 + y * sin60, -x * sin60 - y * cos60)

  // --------------------------------------------------------------- helpers

  // sqrt-of-squares rather than hypot: same value to ~1ulp, and it has an
  // exact arithmetic mirror in the q_cahill oracle (DuckDB has no hypot)
  private def dist(a: Array[Double], b: Array[Double]): Double = {
    val dx = a(0) - b(0); val dy = a(1) - b(1)
    math.sqrt(dx * dx + dy * dy)
  }

  private def interp(length: Double, total: Double,
                     start: Array[Double], end: Array[Double]): Array[Double] = Array(
    start(0) + (end(0) - start(0)) * length / total,
    start(1) + (end(1) - start(1)) * length / total)

  private def lineIntersection(p1: Array[Double], slope1: Double,
                               p2: Array[Double], slope2: Double): Array[Double] = {
    val m1 = math.tan(slope1 * D2R)
    val m2 = math.tan(slope2 * D2R)
    val x = (m1 * p1(0) - m2 * p2(0) - p1(1) + p2(1)) / (m1 - m2)
    Array(x, m1 * (x - p1(0)) + p1(1))
  }

  private def circleLineIntersection(center: Array[Double], radius: Double,
                                     p1: Array[Double], p2: Array[Double]): (Boolean, Array[Double]) = {
    val dx = p2(0) - p1(0); val dy = p2(1) - p1(1)
    val fx = p1(0) - center(0); val fy = p1(1) - center(1)
    val a = dx * dx + dy * dy
    val b = 2 * (dx * fx + dy * fy)
    val c = fx * fx + fy * fy - radius * radius
    val d = b * b - 4 * a * c
    if (a == 0 || d < 0) return (false, Array(0.0, 0.0))
    val root = math.sqrt(d)
    val u1 = (-b + root) / (2 * a)
    val u2 = (-b - root) / (2 * a)
    val u = if (u1 >= 0 && u1 <= 1) u1 else if (u2 >= 0 && u2 <= 1) u2 else Double.NaN
    if (u.isNaN) (false, Array(0.0, 0.0))
    else (true, Array(p1(0) + u * dx, p1(1) + u * dy))
  }

  private def radialPoint(origin: Array[Double], length: Double, angle: Double): (Double, Double) =
    (origin(0) + length * math.cos(angle * D2R), origin(1) + length * math.sin(angle * D2R))

  private def radialPoint2(origin: Array[Double], length: Double, angle: Double): Array[Double] = {
    val r = radialPoint(origin, length, angle)
    Array(r._1, r._2)
  }

  private def truncate(n: Double): Double = if (n > 0) math.floor(n) else math.ceil(n)
}
