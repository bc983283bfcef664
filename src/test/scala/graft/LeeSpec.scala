package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Crs, Lee}

/** Lee conformal tetrahedral rectangles (markley / calm) — layout frame,
 * conformality, base-net unfolding, round-trips. */
class LeeSpec extends AnyFunSuite {

  private val D2R = math.Pi / 180.0
  private val Sqrt3 = math.sqrt(3)

  test("every grid direction projects inside the centered 8 x 2*sqrt(3) frame") {
    for (eng <- Seq(Lee.markley, Lee.calm)) {
      for (lon <- -175 to 180 by 5; lat <- -85 to 85 by 5) {
        val r = eng.forward(lon * D2R, lat * D2R)
        assert(r.isDefined, s"no projection at ($lon, $lat)")
        val (x, y) = r.get
        assert(x >= -4.0 - 1e-9 && x <= 4.0 + 1e-9, s"x out of frame at ($lon, $lat): $x")
        assert(y >= -Sqrt3 - 1e-9 && y <= Sqrt3 + 1e-9, s"y out of frame at ($lon, $lat): $y")
      }
    }
  }

  test("tetrahedron net: attached faces agree on their shared edges") {
    val eng = Lee.markley.base
    for (id <- 1 until 4) {
      val child = eng.faces(id)
      val parent = eng.faces(0)
      val shared = for {
        a <- child.coordsDeg
        b <- parent.coordsDeg
        if math.abs(a(0) - b(0)) < 1e-9 && math.abs(a(1) - b(1)) < 1e-9
      } yield a
      assert(shared.length == 2, s"face $id shares ${shared.length} vertices with the root")
      shared.foreach { v =>
        val (cx, cy) = child.projector.project(v(0) * D2R, v(1) * D2R)
        val (px, py) = parent.projector.project(v(0) * D2R, v(1) * D2R)
        val ct = child.transform; val pt = parent.transform
        val cux = ct(0) * cx + ct(1) * cy + ct(2); val cuy = ct(3) * cx + ct(4) * cy + ct(5)
        val pux = pt(0) * px + pt(1) * py + pt(2); val puy = pt(3) * px + pt(4) * py + pt(5)
        assert(math.abs(cux - pux) < 1e-6 && math.abs(cuy - puy) < 1e-6,
          s"edge mismatch on pair ($id,0)")
      }
    }
  }

  test("conformality: the local Jacobian is a similarity away from singularities") {
    val eng = Lee.markley
    val h = 1e-6
    for ((lon, lat) <- Seq((2.35, 48.85), (-74.0, 40.7), (139.7, 35.7), (18.4, -33.9))) {
      val (x0, y0) = eng.forward(lon * D2R, lat * D2R).get
      val (xl, yl) = eng.forward((lon + h) * D2R, lat * D2R).get
      val (xp, yp) = eng.forward(lon * D2R, (lat + h) * D2R).get
      // d/dlon scaled by cos(lat) so both directions are equal ground units
      val c = math.cos(lat * D2R)
      val j11 = (xl - x0) / h / c; val j21 = (yl - y0) / h / c
      val j12 = (xp - x0) / h; val j22 = (yp - y0) / h
      val s1 = math.hypot(j11, j21)
      val s2 = math.hypot(j12, j22)
      assert(math.abs(s1 / s2 - 1.0) < 1e-3, s"anisotropy at ($lon, $lat): $s1 vs $s2")
      // orthogonality of the two image directions
      val dot = (j11 * j12 + j21 * j22) / (s1 * s2)
      assert(math.abs(dot) < 1e-3, s"shear at ($lon, $lat): $dot")
    }
  }

  test("forward/inverse round-trips for both variants") {
    for (eng <- Seq(Lee.markley, Lee.calm);
         (lon, lat) <- Seq((2.35, 48.85), (-74.0, 40.7), (139.7, 35.7),
           (151.2, -33.9), (-58.4, -34.6), (18.4, -33.9), (0.0, 0.0))) {
      val (x, y) = eng.forward(lon * D2R, lat * D2R).get
      val inv = eng.inverse(x, y)
      assert(inv.isDefined, s"no inverse at ($lon, $lat)")
      val (lam2, phi2) = inv.get
      assert(math.abs(lam2 / D2R - lon) < 1e-5 && math.abs(phi2 / D2R - lat) < 1e-5,
        s"roundtrip at ($lon, $lat): (${lam2 / D2R}, ${phi2 / D2R})")
    }
  }

  test("catalog wiring: -proj markley / calm; aspects differ") {
    for (spec <- Seq("markley", "calm", "+proj=markley", "+proj=calm")) {
      val p = Crs.fromProj4(spec)
      val (x, y) = p.forward(2.35, 48.85)
      assert(x.isFinite && y.isFinite)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - 2.35) < 1e-4 && math.abs(lat2 - 48.85) < 1e-4)
    }
    val a = Crs.fromProj4("markley").forward(2.35, 48.85)
    val b = Crs.fromProj4("calm").forward(2.35, 48.85)
    assert(math.abs(a._1 - b._1) > 1.0 || math.abs(a._2 - b._2) > 1.0)
  }
}
