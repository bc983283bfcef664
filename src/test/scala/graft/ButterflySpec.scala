package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Butterfly, CahillKeyes, Crs}

/** Octahedral butterfly / Cahill-Keyes invariants (reference:
 * mapshaper-butterfly-projections.mjs, mapshaper-cahill-keyes.mjs). */
class ButterflySpec extends AnyFunSuite {

  private val D2R = math.Pi / 180.0

  test("truncated-octahedron finder covers the sphere with 32 faces") {
    val eng = Butterfly.butterfly
    assert(eng.faces.length == 32)
    var seen = Set.empty[Int]
    for (lon <- -175 to 180 by 5; lat <- -85 to 85 by 5) {
      val r = eng.faceLocal(lon * D2R, lat * D2R)
      assert(r.isDefined, s"no face at ($lon, $lat)")
      assert(r.get._1 >= 0 && r.get._1 < 32)
      seen += r.get._1
    }
    assert(seen.size > 24, s"only ${seen.size} faces hit")
  }

  test("attached faces agree on their shared edge after unfolding") {
    for (eng <- Seq(Butterfly.butterfly, Butterfly.cahillKeyes)) {
      var checked = 0
      for (id <- 1 until 32) {
        val parentId = eng.parentOf(id)
        val child = eng.faces(id)
        val parent = eng.faces(parentId)
        val shared = for {
          a <- child.coordsDeg
          b <- parent.coordsDeg
          if math.abs(a(0) - b(0)) < 1e-9 && math.abs(a(1) - b(1)) < 1e-9
        } yield a
        assert(shared.length >= 2, s"faces $id and $parentId share ${shared.length} vertices")
        shared.take(2).foreach { v =>
          val (cx, cy) = child.projector.project(v(0) * D2R, v(1) * D2R)
          val (px, py) = parent.projector.project(v(0) * D2R, v(1) * D2R)
          val ct = child.transform; val pt = parent.transform
          val cux = ct(0) * cx + ct(1) * cy + ct(2); val cuy = ct(3) * cx + ct(4) * cy + ct(5)
          val pux = pt(0) * px + pt(1) * py + pt(2); val puy = pt(3) * px + pt(4) * py + pt(5)
          assert(math.abs(cux - pux) < 1e-9 && math.abs(cuy - puy) < 1e-9,
            s"edge mismatch pair ($id,$parentId)")
        }
        checked += 1
      }
      assert(checked == 31)
    }
  }

  test("cahill-keyes raw transform: equator, meridians, and M-symmetry") {
    val ck = new CahillKeyes(10000)
    // the equator maps onto straight segments of total length ~2*lengthGFE
    // per octant edge; antipodal meridian symmetry: (lon, lat) vs (lon, -lat)
    // land mirrored across the octant fold
    val (x1, y1) = ck.forward(10 * D2R, 20 * D2R)
    val (x2, y2) = ck.forward(10 * D2R, -20 * D2R)
    assert(x1.isFinite && y1.isFinite && x2.isFinite && y2.isFinite)
    assert(math.abs(x1 - x2) > 1e-9 || math.abs(y1 - y2) > 1e-9) // octants differ
    // pole: lat 90 maps to a single point per octant arm (zone A at m-fold)
    val (px, py) = ck.forward(10 * D2R, 90 * D2R)
    assert(px.isFinite && py.isFinite)
  }

  test("catalog wiring: butterfly / butterfly2 / cahill_keyes forward") {
    for (spec <- Seq("butterfly", "butterfly2", "cahill_keyes",
      "+proj=butterfly +lon_0=0", "cahillkeyes")) {
      val p = Crs.fromProj4(spec)
      for ((lon, lat) <- Seq((2.35, 48.85), (-74.0, 40.7), (139.7, 35.7),
        (151.2, -33.9), (18.4, -33.9))) {
        val (x, y) = p.forward(lon, lat)
        assert(x.isFinite && y.isFinite, s"$spec at ($lon, $lat)")
        assert(math.abs(x) < 6 * Crs.A && math.abs(y) < 6 * Crs.A)
      }
    }
    // aspect difference: butterfly vs butterfly2 shift the same engine
    val a = Crs.fromProj4("butterfly").forward(2.35, 48.85)
    val b = Crs.fromProj4("butterfly2").forward(2.35, 48.85)
    assert(math.abs(a._1 - b._1) > 1.0 || math.abs(a._2 - b._2) > 1.0)
  }

  test("continuity inside octant interiors") {
    val p = Crs.fromProj4("cahill_keyes")
    for ((lon, lat) <- Seq((2.35, 48.85), (139.7, 35.7), (-74.0, 40.7), (18.4, -33.9))) {
      val (x0, y0) = p.forward(lon, lat)
      val (x1, y1) = p.forward(lon + 0.1, lat + 0.1)
      val d = math.hypot(x1 - x0, y1 - y0)
      assert(d < 300000.0, s"jump of $d m near ($lon, $lat)")
    }
  }
}
