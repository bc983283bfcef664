package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Crs, Mixed}

/** Generic mixed/compound projection (reference:
 * mapshaper-mixed-projection.mjs) — frame routing, affine placement,
 * and parity with the specialized albersusa composite. */
class MixedSpec extends AnyFunSuite {

  private val albers = Crs.Albers(29.5, 45.5, 37.5, -96.0)

  test("first containing frame wins; outside every frame -> infinity") {
    val p = Mixed(albers, (-129, 23, -62, 52),
      Mixed.Frame(Crs.Albers(55.0, 70.0, 65.0, -148.0), (-172.26, 50.89, -127.00, 73.21),
        origin = Some((-152.0, 63.0)), placement = Some((-1882782.0, -969242.0)),
        scale = 0.37))
    val (x, y) = p.forward(-96.0, 37.5)
    assert(x.isFinite && y.isFinite)
    // Anchorage routes to the AK inset (bbox overlap: main listed first but
    // AK lon range is outside the main bbox)
    val (ax, ay) = p.forward(-149.9, 61.2)
    assert(ax.isFinite && ay.isFinite)
    // Honolulu: no frame -> infinity
    val (hx, hy) = p.forward(-157.85, 21.3)
    assert(hx.isInfinite && hy.isInfinite)
  }

  test("placement lands the origin; scale contracts about the origin") {
    val inset = Mixed.Frame(albers, (-129, 23, -62, 52),
      origin = Some((-96.0, 37.5)), placement = Some((1000.0, 2000.0)), scale = 0.5)
    val p = Crs.MixedProj(Seq(inset))
    val (ox, oy) = p.forward(-96.0, 37.5)
    assert(math.abs(ox - 1000.0) < 1e-6 && math.abs(oy - 2000.0) < 1e-6)
    // distances from the origin halve
    val (bx0, by0) = albers.forward(-95.0, 38.0)
    val (o0x, o0y) = albers.forward(-96.0, 37.5)
    val rawD = math.hypot(bx0 - o0x, by0 - o0y)
    val (bx, by) = p.forward(-95.0, 38.0)
    val placedD = math.hypot(bx - 1000.0, by - 2000.0)
    assert(math.abs(placedD - rawD * 0.5) < 1e-6)
  }

  test("rotation turns the frame about its origin (Matrix2D op order)") {
    val inset = Mixed.Frame(albers, (-129, 23, -62, 52),
      origin = Some((-96.0, 37.5)), placement = Some((0.0, 0.0)), rotationDeg = 90.0)
    val p = Crs.MixedProj(Seq(inset))
    val (o0x, o0y) = albers.forward(-96.0, 37.5)
    val (bx0, by0) = albers.forward(-95.0, 38.0)
    val vx = bx0 - o0x; val vy = by0 - o0y
    val (bx, by) = p.forward(-95.0, 38.0)
    // rotate(q): [cos -sin; sin cos] -> 90 deg sends (vx, vy) to (-vy, vx)
    assert(math.abs(bx - (-vy)) < 1e-6, s"$bx vs ${-vy}")
    assert(math.abs(by - vx) < 1e-6, s"$by vs $vx")
  }

  test("mixed frames reproduce the albersusa composite") {
    val usa = Crs.AlbersUsa()
    val mixed = Mixed(Crs.AlbersUsa.Main.proj, (-129, 23, -62, 52),
      Mixed.Frame(Crs.AlbersUsa.AK.proj, (-172.26, 50.89, -127.00, 73.21),
        origin = Some((-152.0, 63.0)), placement = Some((-1882782.0, -969242.0)),
        scale = 0.37),
      Mixed.Frame(Crs.AlbersUsa.HI.proj, (-160.50, 18.72, -154.57, 22.58),
        origin = Some((-157.0, 21.0)), placement = Some((-1050326.0, -1055362.0)),
        scale = 1.0))
    for ((lon, lat) <- Seq((-96.0, 37.5), (-122.4, 37.8), (-74.0, 40.7),
      (-149.9, 61.2), (-157.85, 21.3))) {
      val (x1, y1) = usa.forward(lon, lat)
      val (x2, y2) = mixed.forward(lon, lat)
      assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6,
        s"($lon, $lat): albersusa ($x1, $y1) vs mixed ($x2, $y2)")
    }
  }
}
