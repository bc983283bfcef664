package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Crs, Dymaxion, Polyhedral}

/**
 * Dymaxion / polyhedral unfolding invariants. The face-local arithmetic
 * (rotation, icosahedron construction, containment, Gray-Fuller) is
 * oracle-verified end to end by q_dymaxion; these cases pin the UNFOLDING
 * (spanning-tree transforms, scale, outline) which has no SQL mirror.
 */
class PolyhedralSpec extends AnyFunSuite {

  private val D2R = math.Pi / 180.0

  test("every direction on a 5-degree grid lands in exactly one first face") {
    val eng = Dymaxion.fuller
    var n = 0
    for (lon <- -175 to 180 by 5; lat <- -85 to 85 by 5) {
      val (lam, phi) = (lon * D2R, lat * D2R)
      val r = eng.faceLocal(lam, phi)
      assert(r.isDefined, s"no face for ($lon, $lat)")
      assert(r.get._1 >= 0 && r.get._1 < 24)
      n += 1
    }
    assert(n > 2000)
  }

  test("attached faces agree on their shared edge after unfolding") {
    // the spanning tree has 23 attached pairs; for each, the shared edge's
    // endpoints must land on identical planar points through either face's
    // projector+transform chain (this is the defining property of the
    // edge-alignment similarity transforms)
    for (eng <- Seq(Dymaxion.fuller, Dymaxion.gnomonic)) {
      val parents = Array(
        -1, 0, 1, 11, 13, 6, 7, 1, 7, 8, 9, 10, 11, 12, 13, 6, 8, 10, 17, 21, 16, 15, 19, 19)
      var checked = 0
      for (id <- 1 until 24) {
        val p = parents(id)
        val child = eng.faces(id)
        val parent = eng.faces(p)
        // find shared vertices (degree-coincident coordinates)
        val shared = for {
          a <- child.coordsDeg
          b <- parent.coordsDeg
          if math.abs(a(0) - b(0)) < 1e-9 && math.abs(a(1) - b(1)) < 1e-9
        } yield a
        assert(shared.length >= 2, s"faces $id and $p share ${shared.length} vertices")
        shared.take(2).foreach { v =>
          val (cx, cy) = child.projector.project(v(0) * D2R, v(1) * D2R)
          val (px, py) = parent.projector.project(v(0) * D2R, v(1) * D2R)
          val ct = child.transform; val pt = parent.transform
          val cux = ct(0) * cx + ct(1) * cy + ct(2); val cuy = ct(3) * cx + ct(4) * cy + ct(5)
          val pux = pt(0) * px + pt(1) * py + pt(2); val puy = pt(3) * px + pt(4) * py + pt(5)
          assert(math.abs(cux - pux) < 1e-9 && math.abs(cuy - puy) < 1e-9,
            s"edge mismatch on pair ($id,$p): ($cux,$cuy) vs ($pux,$puy)")
        }
        checked += 1
      }
      assert(checked == 23)
    }
  }

  test("outline is closed and spans the unfolded sheet") {
    val rings = Dymaxion.fuller.outline
    assert(rings.nonEmpty)
    rings.foreach { r =>
      assert(r.length >= 4)
      assert(math.abs(r.head(0) - r.last(0)) < 1e-9 && math.abs(r.head(1) - r.last(1)) < 1e-9)
    }
    // centered frame: bbox midpoint at the origin
    val all = rings.flatten
    val minX = all.map(_(0)).min; val maxX = all.map(_(0)).max
    val minY = all.map(_(1)).min; val maxY = all.map(_(1)).max
    assert(math.abs(minX + maxX) < 1e-9 && math.abs(minY + maxY) < 1e-9)
    // the airocean sheet is wide (roughly 5.5 radians across)
    assert(maxX - minX > 3.0)
  }

  test("forward/inverse round-trips for both facet methods") {
    val samples = Seq((2.35, 48.85), (-74.0, 40.7), (139.7, 35.7), (151.2, -33.9),
      (-58.4, -34.6), (18.4, -33.9), (-21.9, 64.1), (0.0, 0.0), (170.0, -45.0))
    for (eng <- Seq(Dymaxion.fuller, Dymaxion.gnomonic); (lon, lat) <- samples) {
      val f = eng.forward(lon * D2R, lat * D2R)
      assert(f.isDefined)
      val (x, y) = f.get
      val inv = eng.inverse(x, y)
      assert(inv.isDefined, s"no inverse at ($lon, $lat)")
      val (lam2, phi2) = inv.get
      assert(math.abs(lam2 / D2R - lon) < 1e-6, s"lon roundtrip ($lon, $lat)")
      assert(math.abs(phi2 / D2R - lat) < 1e-6, s"lat roundtrip ($lon, $lat)")
    }
  }

  test("catalog wiring: -proj dymaxion / dymaxion2 parse and project") {
    for (spec <- Seq("dymaxion", "+proj=dymaxion", "dymaxion2", "+proj=dymaxion2")) {
      val p = Crs.fromProj4(spec)
      val xy = p.forward(2.35, 48.85); val x = xy._1; val y = xy._2
      assert(x.isFinite && y.isFinite)
      // meters scale: within the unfolded sheet (~ +-3.2 earth radii)
      assert(math.abs(x) < 4 * Crs.A && math.abs(y) < 4 * Crs.A)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - 2.35) < 1e-5 && math.abs(lat2 - 48.85) < 1e-5)
    }
    // distinct outputs for the two facet methods (different local transforms)
    val a = Crs.fromProj4("dymaxion").forward(2.35, 48.85)
    val b = Crs.fromProj4("dymaxion2").forward(2.35, 48.85)
    assert(math.abs(a._1 - b._1) > 1.0 || math.abs(a._2 - b._2) > 1.0)
    // +lon_0 shifts the central meridian (and round-trips through it)
    val shifted = Crs.fromProj4("+proj=dymaxion +lon_0=10")
    val c = shifted.forward(2.35, 48.85)
    assert(math.abs(a._1 - c._1) > 1.0 || math.abs(a._2 - c._2) > 1.0)
    val d = Crs.fromProj4("dymaxion").forward(2.35 - 10.0, 48.85)
    assert(math.abs(c._1 - d._1) < 1e-6 && math.abs(c._2 - d._2) < 1e-6)
    val (lonBack, latBack) = shifted.inverse(c._1, c._2)
    assert(math.abs(lonBack - 2.35) < 1e-6 && math.abs(latBack - 48.85) < 1e-6)
  }

  test("raster reprojection pulls through the dymaxion inverse") {
    import graft.operators.Raster
    val p = Crs.fromProj4("dymaxion")
    // source: global lon/lat grid with a LINEAR field (bilinear-exact away
    // from the sampling edges): v = lon + 2*lat
    val srcW = 360; val srcH = 180
    val vals = Array.tabulate(srcW * srcH) { i =>
      val x = i % srcW; val y = i / srcW
      (-180 + (x + 0.5)) + 2.0 * (90 - (y + 0.5))
    }
    val src = Raster.Grid(srcW, srcH, vals, Raster.Georef(-180, 90, 1.0))
    // destination: the unfolded airocean sheet at 200 km pixels
    val dstW = 220; val dstH = 120
    val georef = Raster.Georef(-2.2e7, 1.2e7, 200000.0)
    val g = Raster.reproject(src, p, georef, dstW, dstH)
    var checked = 0
    for (y <- 0 until dstH; x <- 0 until dstW) {
      val v = g.values(y * dstW + x)
      if (!v.isNaN) {
        val px = georef.x0 + (x + 0.5) * georef.cellSize
        val py = georef.y1 - (y + 0.5) * georef.cellSize
        val (lon, lat) = p.inverse(px, py)
        if (lon.isFinite && math.abs(lat) < 88 && math.abs(lon) < 178) {
          assert(math.abs(v - (lon + 2.0 * lat)) < 0.1,
            s"pixel ($x,$y): $v vs ${lon + 2.0 * lat} at ($lon, $lat)")
          checked += 1
        }
      }
    }
    assert(checked > 3000, s"only $checked in-sheet pixels verified")
  }

  test("neighboring points project to nearby planar points within a face") {
    // continuity probe: 0.1-degree steps around several cities stay within
    // a few hundred km in the projected frame (no face-assignment jumps
    // inside face interiors)
    val p = Crs.fromProj4("dymaxion")
    for ((lon, lat) <- Seq((2.35, 48.85), (139.7, 35.7), (-74.0, 40.7))) {
      val (x0, y0) = p.forward(lon, lat)
      val (x1, y1) = p.forward(lon + 0.1, lat + 0.1)
      val d = math.hypot(x1 - x0, y1 - y0)
      assert(d < 300000.0, s"jump of $d m near ($lon, $lat)")
    }
  }
}
