package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Crs

/**
 * CRS correctness via the projections' defining mathematical properties —
 * each invariant below is violated by any transcription error in the
 * forward formulas, and the inverses are independent (iterative) formulas,
 * so round-trip agreement is real evidence.
 */
class CrsSpec extends AnyFunSuite {

  private val testPts = for {
    lon <- Seq(-170.0, -96.3, -75.123, 0.7, 45.0, 139.7)
    lat <- Seq(-60.0, -33.9, 0.2, 39.456, 60.1, 78.0)
  } yield (lon, lat)

  private def roundTrip(p: Crs.Proj, tolDeg: Double = 1e-9): Unit =
    testPts.foreach { case (lon, lat) =>
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < tolDeg && math.abs(lat2 - lat) < tolDeg,
        s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }

  /** Local scale along the parallel (planar / ellipsoidal distance). */
  private def parallelScale(p: Crs.Proj, lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x1, y1) = p.forward(lon - d / 2, lat)
    val (x2, y2) = p.forward(lon + d / 2, lat)
    val planar = math.hypot(x2 - x1, y2 - y1)
    val arc = d * Crs.D2R * Crs.A * Crs.mAux(lat * Crs.D2R)
    planar / arc
  }

  /** Local scale along the meridian. */
  private def meridianScale(p: Crs.Proj, lon: Double, lat: Double): Double = {
    val d = 1e-6
    val (x1, y1) = p.forward(lon, lat - d / 2)
    val (x2, y2) = p.forward(lon, lat + d / 2)
    val planar = math.hypot(x2 - x1, y2 - y1)
    val s = math.sin(lat * Crs.D2R)
    val rMer = Crs.A * (1 - Crs.E2) / math.pow(1 - Crs.E2 * s * s, 1.5)
    planar / (d * Crs.D2R * rMer)
  }

  test("Albers: unit scale on standard parallels, h*k = 1 everywhere, round-trip") {
    val p = Crs.Albers(29.5, 45.5, 23.0, -96.0)
    // k = 1 exactly on both standard parallels
    assert(math.abs(parallelScale(p, -96.0, 29.5) - 1.0) < 1e-6)
    assert(math.abs(parallelScale(p, -80.0, 45.5) - 1.0) < 1e-6)
    // equal-area: meridian scale * parallel scale = 1 at arbitrary points
    Seq((-75.123, 39.456), (-110.0, 30.0), (-96.0, 50.0)).foreach { case (lon, lat) =>
      val hk = meridianScale(p, lon, lat) * parallelScale(p, lon, lat)
      assert(math.abs(hk - 1.0) < 1e-5, s"h*k=$hk at ($lon,$lat)")
    }
    roundTrip(p)
  }

  test("LCC: conformal (h = k), unit scale on standard parallels, round-trip") {
    val p = Crs.Lcc(33.0, 45.0, 39.0, -96.0)
    assert(math.abs(parallelScale(p, -96.0, 33.0) - 1.0) < 1e-6)
    assert(math.abs(parallelScale(p, -85.0, 45.0) - 1.0) < 1e-6)
    Seq((-75.123, 39.456), (-110.0, 30.0), (-96.0, 55.0)).foreach { case (lon, lat) =>
      val h = meridianScale(p, lon, lat)
      val k = parallelScale(p, lon, lat)
      assert(math.abs(h / k - 1.0) < 1e-5, s"h=$h k=$k at ($lon,$lat)")
    }
    roundTrip(p)
  }

  test("UTM: k0 at central meridian, 500km false easting, zone math, round-trip") {
    val p = Crs.utm(18) // central meridian -75
    val (xc, _) = p.forward(-75.0, 40.0)
    assert(math.abs(xc - 500000.0) < 1e-6)
    assert(math.abs(meridianScale(p, -75.0, 40.0) - 0.9996) < 1e-6)
    // conformal away from CM too
    val h = meridianScale(p, -73.0, 40.0)
    val k = parallelScale(p, -73.0, 40.0)
    assert(math.abs(h / k - 1.0) < 1e-5)
    assert(Crs.utmZone(-75.0) == 18 && Crs.utmZone(0.1) == 31 && Crs.utmZone(-180.0) == 1)
    // southern hemisphere false northing
    val (_, ys) = Crs.utm(18, south = true).forward(-75.0, -1.0)
    assert(ys > 9000000.0)
    // series accuracy: round-trip within zone +- 3 degrees
    val pts = for (lon <- Seq(-78.0, -75.0, -72.0); lat <- Seq(-70.0, -10.0, 0.0, 40.0, 70.0)) yield (lon, lat)
    pts.foreach { case (lon, lat) =>
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
  }

  test("spherical rotation: pure lambda shift wraps, full rotation round-trips") {
    val shift = Crs.Rotation(30.0, 0.0, 0.0)
    val (l1, p1) = shift.forward(170.0, 10.0)
    assert(math.abs(l1 - (-160.0)) < 1e-12 && math.abs(p1 - 10.0) < 1e-12)
    val rot = Crs.Rotation(25.0, 15.0, 30.0)
    testPts.foreach { case (lon, lat) =>
      val (x, y) = rot.forward(lon, lat)
      val (lon2, lat2) = rot.inverse(x, y)
      val dLon = math.abs(((lon2 - lon) % 360 + 540) % 360 - 180)
      assert(dLon < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"($lon,$lat)")
      // rotation is an isometry of the sphere: distances to a second point hold
      val (x2, y2) = rot.forward(lon + 3.0, lat)
      def gc(a1: Double, b1: Double, a2: Double, b2: Double): Double = {
        val d2r = Crs.D2R
        math.acos(math.max(-1, math.min(1,
          math.sin(b1 * d2r) * math.sin(b2 * d2r) +
            math.cos(b1 * d2r) * math.cos(b2 * d2r) * math.cos((a1 - a2) * d2r))))
      }
      assert(math.abs(gc(x, y, x2, y2) - gc(lon, lat, lon + 3.0, lat)) < 1e-9)
    }
  }

  test("AEQD: planar distance from center equals great-circle distance; round-trip") {
    val p = Crs.Aeqd(40.0, -100.0)
    testPts.foreach { case (lon, lat) =>
      val (x, y) = p.forward(lon, lat)
      val planar = math.hypot(x, y)
      // spherical great-circle distance on the same sphere
      val c = {
        val phi0 = 40.0 * Crs.D2R; val phi = lat * Crs.D2R
        val dl = (lon + 100.0) * Crs.D2R
        math.acos(math.max(-1, math.min(1,
          math.sin(phi0) * math.sin(phi) + math.cos(phi0) * math.cos(phi) * math.cos(dl))))
      }
      assert(math.abs(planar - Crs.A * c) < 1e-6, s"($lon,$lat)")
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-9)
      // longitude may wrap at the antipode; compare mod 360
      val dLon = math.abs(((lon2 - lon) % 360 + 540) % 360 - 180)
      assert(dLon < 1e-9 || math.abs(c - math.Pi) < 1e-6)
    }
  }
}
