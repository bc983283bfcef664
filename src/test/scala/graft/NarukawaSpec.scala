package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Crs, Narukawa}

/** Narukawa 2022 AuthaGraph approximation — frame, round-trips, facets. */
class NarukawaSpec extends AnyFunSuite {

  private val D2R = math.Pi / 180.0
  private val edgeScale = math.acos(-1.0 / 3) / 2
  private val sqrt3 = math.sqrt(3)

  test("every grid direction lands inside the 4*sqrt(3) x 3 frame") {
    for (lon <- -175 to 180 by 5; lat <- -85 to 85 by 5) {
      val (x, y) = Narukawa.forward(lon * D2R, lat * D2R)
      assert(math.abs(x) <= 2 * sqrt3 * edgeScale + 1e-9, s"x at ($lon, $lat): $x")
      assert(math.abs(y) <= 1.5 * edgeScale + 1e-9, s"y at ($lon, $lat): $y")
    }
  }

  test("forward/inverse round-trips at sample cities") {
    for ((lon, lat) <- Seq((2.35, 48.85), (-74.0, 40.7), (139.7, 35.7),
      (151.2, -33.9), (-58.4, -34.6), (18.4, -33.9), (77.2, 28.6), (0.0, 0.0))) {
      val (x, y) = Narukawa.forward(lon * D2R, lat * D2R)
      val (lam2, phi2) = Narukawa.inverse(x, y)
      assert(math.abs(lam2 / D2R - lon) < 1e-5 && math.abs(phi2 / D2R - lat) < 1e-5,
        s"roundtrip at ($lon, $lat): (${lam2 / D2R}, ${phi2 / D2R})")
    }
  }

  test("facet transform: faceInverse inverts faceForward") {
    for (lam <- Seq(-0.9, -0.3, 0.0, 0.4, 1.0); phi <- Seq(-0.3, 0.1, 0.6, 1.2)) {
      val (r, theta) = Narukawa.faceForward(lam, phi)
      val (phi2, lam2) = Narukawa.faceInverse(r, theta)
      assert(math.abs(lam2 - lam) < 1e-9 && math.abs(phi2 - phi) < 1e-9,
        s"facet roundtrip at ($lam, $phi)")
    }
  }

  test("catalog wiring: -proj narukawa2022") {
    for (spec <- Seq("narukawa2022", "narukawa", "+proj=narukawa2022")) {
      val p = Crs.fromProj4(spec)
      val (x, y) = p.forward(139.7, 35.7)
      assert(x.isFinite && y.isFinite)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - 139.7) < 1e-4 && math.abs(lat2 - 35.7) < 1e-4)
    }
  }

  test("continuity inside facet interiors") {
    for ((lon, lat) <- Seq((2.35, 48.85), (139.7, 35.7), (-74.0, 40.7))) {
      val (x0, y0) = Narukawa.forward(lon * D2R, lat * D2R)
      val (x1, y1) = Narukawa.forward((lon + 0.1) * D2R, (lat + 0.1) * D2R)
      val d = math.hypot(x1 - x0, y1 - y0) * Crs.A
      assert(d < 300000.0, s"jump of $d m near ($lon, $lat)")
    }
  }
}
