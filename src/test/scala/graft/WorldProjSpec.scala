package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Crs

/**
 * The round-3 world projections (Robinson, Mollweide, sinusoidal, equal
 * earth, stereographic), the `+proj=` string front-end, and densified path
 * reprojection — verified through defining mathematical properties
 * (equal-area Jacobians, conformal scale equality, table knots, published
 * frame dimensions), so a transcription error in any formula fails a test.
 */
class WorldProjSpec extends AnyFunSuite {

  private val R = Crs.A
  private val pts = for {
    lon <- Seq(-170.0, -96.3, 0.7, 45.0, 139.7)
    lat <- Seq(-60.0, -33.9, 0.2, 39.456, 78.0)
  } yield (lon, lat)

  private def roundTrip(p: Crs.Proj, tol: Double = 1e-8): Unit =
    pts.foreach { case (lon, lat) =>
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < tol && math.abs(lat2 - lat) < tol,
        s"($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }

  /** Numeric area Jacobian ∂(x,y)/∂(λ,φ) in rad². */
  private def jacobian(p: Crs.Proj, lon: Double, lat: Double): Double = {
    val d = 1e-5
    val (x1, y1) = p.forward(lon - d / 2, lat)
    val (x2, y2) = p.forward(lon + d / 2, lat)
    val (x3, y3) = p.forward(lon, lat - d / 2)
    val (x4, y4) = p.forward(lon, lat + d / 2)
    val dr = d * Crs.D2R
    ((x2 - x1) / dr) * ((y4 - y3) / dr) - ((x4 - x3) / dr) * ((y2 - y1) / dr)
  }

  private def assertEqualArea(p: Crs.Proj): Unit =
    pts.foreach { case (lon, lat) =>
      val j = jacobian(p, lon, lat)
      val want = R * R * math.cos(lat * Crs.D2R)
      assert(math.abs(j - want) / want < 1e-3, s"J($lon,$lat) = $j, want $want")
    }

  test("Robinson passes through every published table knot; frame dims") {
    val p = Crs.Robinson()
    (0 to 18).foreach { k =>
      val lat = k * 5.0
      val (x, y) = p.forward(100.0, lat)
      assert(math.abs(x - 0.8487 * R * Crs.Robinson.TableX(k) * 100.0 * Crs.D2R) < 1e-6)
      assert(math.abs(y - 1.3523 * R * Crs.Robinson.TableY(k)) < 1e-6)
    }
    // published frame: half-width at equator 0.8487·R·π, pole height 1.3523·R
    assert(math.abs(p.forward(180.0, 0.0)._1 - 0.8487 * R * math.Pi) < 1e-6)
    assert(math.abs(p.forward(0.0, 90.0)._2 - 1.3523 * R) < 1e-6)
    assert(p.forward(0.0, -90.0)._2 == -p.forward(0.0, 90.0)._2)
    // y strictly monotone in lat, x linear in lon
    val ys = (-90 to 90).map(l => p.forward(0.0, l.toDouble)._2)
    assert(ys.zip(ys.tail).forall { case (a, b) => a < b })
    val x1 = p.forward(10.0, 47.3)._1
    assert(math.abs(p.forward(20.0, 47.3)._1 - 2.0 * x1) < 1e-6)
    roundTrip(p, tol = 1e-7)
  }

  test("Mollweide: equal-area, frame dims, round-trip") {
    val p = Crs.Mollweide()
    assertEqualArea(p)
    assert(math.abs(p.forward(180.0, 0.0)._1 - 2.0 * math.sqrt(2.0) * R) < 1e-6)
    assert(math.abs(p.forward(0.0, 90.0)._2 - math.sqrt(2.0) * R) < 1e-3)
    roundTrip(p)
  }

  test("sinusoidal: equal-area, exact closed form, round-trip") {
    val p = Crs.Sinusoidal()
    assertEqualArea(p)
    pts.foreach { case (lon, lat) =>
      val (x, y) = p.forward(lon, lat)
      assert(x == lon * Crs.D2R * math.cos(lat * Crs.D2R) * R)
      assert(y == lat * Crs.D2R * R)
    }
    roundTrip(p)
  }

  test("Equal Earth: equal-area and round-trip") {
    val p = Crs.EqualEarth()
    assertEqualArea(p)
    roundTrip(p)
  }

  test("stereographic: conformal (h == k) and round-trip") {
    val p = Crs.Stereographic(40.0, -100.0)
    val d = 1e-6
    pts.foreach { case (lon, lat) =>
      val (x1, y1) = p.forward(lon - d / 2, lat)
      val (x2, y2) = p.forward(lon + d / 2, lat)
      val (x3, y3) = p.forward(lon, lat - d / 2)
      val (x4, y4) = p.forward(lon, lat + d / 2)
      val k = math.hypot(x2 - x1, y2 - y1) / (d * Crs.D2R * math.cos(lat * Crs.D2R))
      val h = math.hypot(x4 - x3, y4 - y3) / (d * Crs.D2R)
      assert(math.abs(h / k - 1.0) < 1e-4, s"h=$h k=$k at ($lon,$lat)")
    }
    roundTrip(p)
  }

  test("Mercator matches the column-math WebMercator constants") {
    val p = Crs.Mercator()
    val (x, y) = p.forward(12.5, 41.9)
    assert(math.abs(x - 12.5 * Crs.D2R * R) < 1e-9)
    assert(math.abs(y - math.log(math.tan(math.Pi / 4 + 41.9 * Crs.D2R / 2)) * R) < 1e-9)
    roundTrip(p)
  }

  test("+proj= parser builds the same projections as the typed API") {
    val a = Crs.fromProj4("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    assert(a == Crs.Albers(29.5, 45.5, 23.0, -96.0))
    assert(Crs.fromProj4("+proj=utm +zone=33") == Crs.utm(33))
    assert(Crs.fromProj4("+proj=utm +zone=19 +south") == Crs.utm(19, south = true))
    assert(Crs.fromProj4("robinson") == Crs.Robinson())
    assert(Crs.fromProj4("+proj=moll +lon_0=10") == Crs.Mollweide(10.0))
    assert(Crs.fromProj4("wgs84") == Crs.Longlat)
    assert(Crs.fromProj4("+proj=stere +lat_0=90 +lon_0=0") == Crs.Stereographic(90.0, 0.0))
    assertThrows[IllegalArgumentException](Crs.fromProj4("+proj=nosuch"))
    assertThrows[IllegalArgumentException](Crs.fromProj4("not-a-projection"))
    // parsed and typed projections produce identical doubles
    val (x1, y1) = a.forward(-75.0, 35.0)
    val (x2, y2) = Crs.Albers(29.5, 45.5, 23.0, -96.0).forward(-75.0, 35.0)
    assert(x1 == x2 && y1 == y2)
  }

  test("AlbersUSA composite: frame routing, inset scale/placement, inverses") {
    val p = Crs.AlbersUsa()
    val conus = Crs.Albers(29.5, 45.5, 37.5, -96.0)
    // CONUS points project through the main Albers verbatim
    val (dx, dy) = p.forward(-104.9, 39.7) // Denver
    assert((dx, dy) == conus.forward(-104.9, 39.7))
    // Alaska inset: distances shrink by exactly the 0.37 frame scale
    val a1 = p.forward(-149.9, 61.2) // Anchorage
    val a2 = p.forward(-147.7, 64.8) // Fairbanks
    val ak = Crs.Albers(55.0, 70.0, 65.0, -148.0)
    val u1 = ak.forward(-149.9, 61.2); val u2 = ak.forward(-147.7, 64.8)
    val scaled = math.hypot(a2._1 - a1._1, a2._2 - a1._2)
    val unscaled = math.hypot(u2._1 - u1._1, u2._2 - u1._2)
    assert(math.abs(scaled / unscaled - 0.37) < 1e-12)
    // the AK frame origin (-152, 63) lands exactly on its placement point,
    // and Anchorage renders within the inset's ~1500 km neighborhood of it
    val ao = p.forward(-152.0, 63.0)
    assert(math.abs(ao._1 - -1882782.0) < 1e-6 && math.abs(ao._2 - -969242.0) < 1e-6)
    assert(math.hypot(a1._1 - ao._1, a1._2 - ao._2) < 1500000.0)
    // Hawaii inset is a pure shift (scale 1): vector between two points unchanged
    val h1 = p.forward(-157.85, 21.3) // Honolulu
    val h2 = p.forward(-156.3, 20.8)  // Maui
    val hi = Crs.Albers(19.0, 24.0, 20.9, -156.5)
    val v1 = hi.forward(-157.85, 21.3); val v2 = hi.forward(-156.3, 20.8)
    assert(math.abs((h2._1 - h1._1) - (v2._1 - v1._1)) < 1e-9)
    assert(math.abs((h2._2 - h1._2) - (v2._2 - v1._2)) < 1e-9)
    // outside every frame -> (inf, inf), PR only when enabled
    assert(p.forward(-0.1, 51.5)._1.isInfinity) // London
    assert(p.forward(-66.1, 18.4)._1.isInfinity) // San Juan, PR off
    assert(!Crs.AlbersUsa(includePR = true).forward(-66.1, 18.4)._1.isInfinity)
    // inverse round-trips per region
    for ((lon, lat) <- Seq((-104.9, 39.7), (-149.9, 61.2), (-157.85, 21.3))) {
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8, s"($lon,$lat)")
    }
    // string front-end incl. +PR flag
    assert(Crs.fromProj4("albersusa") == Crs.AlbersUsa())
    assert(Crs.fromProj4("albersusa +PR") == Crs.AlbersUsa(includePR = true))
    assert(Crs.fromProj4("albersusa +PR +VI") == Crs.AlbersUsa(true, true))
  }

  test("densified reprojection bounds chord deviation; straight paths untouched") {
    val p = Crs.Mollweide()
    // a long diagonal: genuinely curved in Mollweide (meridians are ellipses)
    val path = Array(-60.0, 20.0, 60.0, 70.0)
    val interval = 10000.0 // 10 km in projected units
    val out = Crs.projectPathDensified(path, p, interval)
    assert(out.length > path.length, "expected inserted vertices")
    // endpoints preserved exactly
    val (ax, ay) = p.forward(-60.0, 20.0); val (bx, by) = p.forward(60.0, 70.0)
    assert(out(0) == ax && out(1) == ay)
    assert(out(out.length - 2) == bx && out(out.length - 1) == by)
    // the recursion invariant: for every final segment, the projected
    // unprojected-midpoint deviates from the chord by at most interval/2
    var i = 0
    while (i + 3 < out.length) {
      val (lon0, lat0) = p.inverse(out(i), out(i + 1))
      val (lon2, lat2) = p.inverse(out(i + 2), out(i + 3))
      val (mx, my) = p.forward((lon0 + lon2) / 2.0, (lat0 + lat2) / 2.0)
      val dx = out(i + 2) - out(i); val dy = out(i + 3) - out(i + 1)
      val len2 = dx * dx + dy * dy
      val t = math.max(0.0, math.min(1.0, ((mx - out(i)) * dx + (my - out(i + 1)) * dy) / len2))
      val dev = math.hypot(mx - (out(i) + t * dx), my - (out(i + 1) + t * dy))
      assert(dev <= interval * 0.51, s"deviation $dev at segment $i")
      i += 2
    }
    // equator in sinusoidal projects to a straight line: nothing inserted
    val straight = Crs.projectPathDensified(Array(-60.0, 0.0, 60.0, 0.0),
      Crs.Sinusoidal(), interval)
    assert(straight.length == 4)
    // parallels are straight in Robinson: nothing inserted there either
    assert(Crs.projectPathDensified(Array(-60.0, 55.0, 60.0, 55.0), Crs.Robinson(),
      interval).length == 4)
    // determinism
    val again = Crs.projectPathDensified(path, p, interval)
    assert(out.sameElements(again))
  }

  test("orthographic / gnomonic / laea: round-trips, properties, parser") {
    // round-trip within each projection's domain
    val center = (30.0, 15.0)
    val near = for {
      lon <- Seq(0.0, 25.0, 60.0); lat <- Seq(-20.0, 10.0, 45.0)
    } yield (lon, lat)
    val ortho = Crs.Orthographic(center._2, center._1)
    val gnom = Crs.Gnomonic(center._2, center._1)
    val laea = Crs.Laea(center._2, center._1)
    near.foreach { case (lon, lat) =>
      Seq[Crs.Proj](ortho, gnom, laea).foreach { p =>
        val (x, y) = p.forward(lon, lat)
        val (lon2, lat2) = p.inverse(x, y)
        assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
          s"$p ($lon,$lat)")
      }
    }
    // laea is equal-area
    assertEqualArea(Crs.Laea(0.0, 0.0))
    // orthographic: the center projects to the origin; 90°-distant points to radius R
    assert(ortho.forward(30.0, 15.0) == ((0.0, 0.0)))
    val (ex, ey) = ortho.forward(120.0, 0.0) // 90° east of center at equator... not exactly 90° away
    assert(math.sqrt(ex * ex + ey * ey) <= R + 1e-6)
    // gnomonic maps great circles to straight lines: three points on the
    // equator (a great circle) must be collinear
    val g = Seq((-130.0, 0.0), (-100.0, 0.0), (-70.0, 0.0)).map {
      case (lo, la) => Crs.Gnomonic(40.0, -100.0).forward(lo, la)
    }
    val cross = (g(1)._1 - g(0)._1) * (g(2)._2 - g(0)._2) -
      (g(1)._2 - g(0)._2) * (g(2)._1 - g(0)._1)
    assert(math.abs(cross) / (R * R) < 1e-6, s"collinearity: $cross")
    // parser
    assert(Crs.fromProj4("+proj=ortho +lat_0=15 +lon_0=30") == ortho)
    assert(Crs.fromProj4("+proj=gnom +lat_0=15 +lon_0=30") == gnom)
    assert(Crs.fromProj4("+proj=laea +lat_0=15 +lon_0=30") == laea)
  }

  test("eqc / cea / natural earth / winkel tripel: properties and round-trips") {
    roundTrip(Crs.Equirectangular(30.0))
    roundTrip(Crs.CylindricalEqualArea(30.0))
    assertEqualArea(Crs.CylindricalEqualArea(30.0))
    // natural earth: equator scale is the published 0.8707 coefficient
    val ne = Crs.NaturalEarth()
    val (nx, nyv) = ne.forward(90.0, 0.0)
    assert(math.abs(nx - R * (90.0 * Crs.D2R) * 0.8707) < 1e-6 && nyv == 0.0)
    roundTrip(ne, tol = 1e-6)
    // winkel tripel: on the equator α = λ/2, so x = R/2 (2λ/π + λ), y = 0
    val wt = Crs.WinkelTripel()
    val lam = 60.0 * Crs.D2R
    val (wx, wy) = wt.forward(60.0, 0.0)
    assert(math.abs(wx - R / 2.0 * (2.0 * lam / math.Pi + lam)) < 1e-6)
    assert(math.abs(wy) < 1e-6)
    // Newton inverse converges over the globe
    roundTrip(wt, tol = 1e-5)
    // parser
    assert(Crs.fromProj4("+proj=eqc +lat_ts=30") == Crs.Equirectangular(30.0))
    assert(Crs.fromProj4("+proj=cea +lat_ts=30") == Crs.CylindricalEqualArea(30.0))
    assert(Crs.fromProj4("+proj=natearth") == ne)
    assert(Crs.fromProj4("+proj=wintri") == wt)
  }

  test("clipSpec: clamp / circle / antimeridian-cut table") {
    assert(Crs.clipSpec(Crs.Mercator()) == Crs.ClampBBox(-180, -89, 180, 89))
    assert(Crs.clipSpec(Crs.Mercator(150.0)) ==
      Crs.CutAtAntimeridian(-30.0, Some(Crs.ClampBBox(-180, -89, 180, 89))))
    // rotated Mercator both cuts AND clamps: a lat-90 vertex must come out
    // clamped to 89, not reach the projection as log(tan(pi/2)) = Inf
    locally {
      val spark = SparkTestBase.spark
      import spark.implicits._
      val paths = Seq((1L, Seq(-40.0, 88.0, -20.0, 90.0))).toDF("pid", "path")
      val parts = graft.operators.SphericalClip
        .prepare(paths, "pid", "path", Crs.clipSpec(Crs.Mercator(150.0)))
        .select("path").as[Seq[Double]].collect()
      assert(parts.flatten.grouped(2).forall(p => p(1) <= 89.0))
    }
    assert(Crs.clipSpec(Crs.Orthographic(15, 30)) == Crs.ClipCircle(30, 15, 89.85))
    assert(Crs.clipSpec(Crs.Gnomonic(40, -100)) == Crs.ClipCircle(-100, 40, 60.0))
    assert(Crs.clipSpec(Crs.Laea(-20, 60)) == Crs.ClipCircle(60, -20, 179.0))
    assert(Crs.clipSpec(Crs.Robinson(100.0)) == Crs.CutAtAntimeridian(-80.0))
    assert(Crs.clipSpec(Crs.Robinson()) == Crs.NoClip)
  }

  test("cutAtLon splits at exact interpolated crossings") {
    import graft.operators.SphericalClip
    val path = Array(-40.0, 0.0, -20.0, 10.0, -35.0, 20.0)
    val parts = SphericalClip.cutAtLon(path, -30.0)
    assert(parts.length == 3)
    // crossing 1: t = (-30 - -40)/(-20 - -40) = 0.5 -> lat 5
    assert(parts(0).toSeq == Seq(-40.0, 0.0, -30.0, 5.0))
    assert(parts(1).head == -30.0 && parts(1)(1) == 5.0)
    // crossing 2: t = (-30 - -20)/(-35 - -20) = 2/3 -> lat 10 + 2/3*10
    val lat2 = 10.0 + (-30.0 - -20.0) / (-35.0 - -20.0) * 10.0
    assert(parts(1).toSeq == Seq(-30.0, 5.0, -20.0, 10.0, -30.0, lat2))
    assert(parts(2).toSeq == Seq(-30.0, lat2, -35.0, 20.0))
    // no crossing -> one part, unchanged
    assert(SphericalClip.cutAtLon(Array(1.0, 2.0, 3.0, 4.0), -30.0).map(_.toSeq) ==
      Seq(Seq(1.0, 2.0, 3.0, 4.0)))
  }

  test("clipPathToCircle keeps inside sub-paths with boundary points on the circle") {
    import graft.operators.SphericalClip
    // path passing through the orthographic far side: center (30,15), 89.85°
    val path = Array(30.0, 15.0, 120.0, 0.0, -150.0, -15.0, 150.0, 80.0)
    val parts = SphericalClip.clipPathToCircle(path, 30.0, 15.0, 89.85)
    assert(parts.nonEmpty)
    val cosLimit = math.cos(89.85 * Crs.D2R)
    parts.foreach { p =>
      var i = 0
      while (i + 1 < p.length) {
        val c = SphericalClip.cosAngular(p(i), p(i + 1), 30.0, 15.0)
        assert(c >= cosLimit - 1e-9, s"vertex outside: ${p(i)},${p(i + 1)}")
        i += 2
      }
    }
    // boundary vertices sit on the circle (bisection tol)
    val ends = parts.flatMap(p => Seq((p(0), p(1)), (p(p.length - 2), p(p.length - 1))))
    val onBoundary = ends.filter { case (x, y) =>
      math.abs(SphericalClip.cosAngular(x, y, 30.0, 15.0) - cosLimit) < 1e-8
    }
    assert(onBoundary.nonEmpty)
    // fully-inside path untouched
    val inside = Array(30.0, 15.0, 40.0, 20.0)
    assert(SphericalClip.clipPathToCircle(inside, 30.0, 15.0, 89.85).map(_.toSeq) ==
      Seq(inside.toSeq))
  }
}
