package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Crs
import graft.operators.Raster
import graft.operators.Raster.{Georef, Grid}
import graft.sources.GeoTiff
import graft.tables.SplitMix64

class RasterSpec extends AnyFunSuite {

  private def mkGrid(w: Int, h: Int, f: (Int, Int) => Double,
                     georef: Georef = Georef(0, 0, 1)): Grid =
    Grid(w, h, Array.tabulate(w * h)(i => f(i % w, i / w)), georef)

  test("box blur preserves constants and total mass on impulse") {
    val const = mkGrid(9, 9, (_, _) => 5.0)
    val b = Raster.boxBlur(const, 2)
    assert(b.values.forall(v => math.abs(v - 5.0) < 1e-12))

    val impulse = mkGrid(15, 15, (x, y) => if (x == 7 && y == 7) 225.0 else 0.0)
    val ib = Raster.boxBlur(impulse, 1)
    // interior impulse: mass conserved, spread over 3x3
    assert(math.abs(ib.values.sum - 225.0) < 1e-9)
    assert(math.abs(ib(7, 7) - 225.0 / 9.0) < 1e-9)
    // gaussian = iterated box stays mass-conserving in the interior
    val gb = Raster.gaussianBlur(impulse, 1, 3)
    assert(math.abs(gb.values.sum - 225.0) < 1e-9)
  }

  test("bilinear resample reproduces a linear gradient exactly") {
    val g = mkGrid(16, 16, (x, y) => 2.0 * x + 3.0 * y)
    val r = Raster.resampleBilinear(g, 8, 8)
    // a bilinear function is reproduced exactly by bilinear interpolation
    // (away from clamped edges); downsample by 2: out(x,y) samples at 2x+0.5
    var y = 1
    while (y < 7) {
      var x = 1
      while (x < 7) {
        val expected = 2.0 * (2 * x + 0.5) + 3.0 * (2 * y + 0.5)
        assert(math.abs(r(x, y) - expected) < 1e-9, s"($x,$y)")
        x += 1
      }
      y += 1
    }
    // upsample keeps the gradient too
    val u = Raster.resampleBilinear(g, 32, 32)
    assert(math.abs(u(15, 15) - (2.0 * (15.5 * 0.5 - 0.5) + 3.0 * (15.5 * 0.5 - 0.5))) < 1e-9)
  }

  test("crop extracts the world-bbox window with an updated georef") {
    val g = mkGrid(10, 10, (x, y) => (y * 10 + x).toDouble, Georef(100.0, 50.0, 2.0))
    // world: x in [100,120], y in [30,50]; crop to x [104,112], y [40,46]
    val c = Raster.crop(g, 104.0, 40.0, 112.0, 46.0)
    assert(c.w == 4 && c.h == 3)
    assert(c.georef.x0 == 104.0 && c.georef.y1 == 46.0)
    // top-left of crop = col 2, row 2 of source
    assert(c(0, 0) == g(2, 2))
    assert(c(3, 2) == g(5, 4))
  }

  test("reproject: identity-like projection round-trips grid values") {
    // lon/lat source grid over [0,16]x[0,16] degrees
    val src = mkGrid(16, 16, (x, y) => x + 0.25 * y, Georef(0.0, 16.0, 1.0))
    val proj = Crs.Aeqd(8.0, 8.0) // centered on the grid
    // destination: 160km cells around the projection origin
    val dst = Raster.reproject(src, proj, Georef(-800000.0, 800000.0, 100000.0), 16, 16)
    // center pixel inverse-projects to ~ (8, 8) -> value ~ 8 + 0.25*8 = 10 (bilinear)
    val center = dst(8, 8)
    assert(!center.isNaN && math.abs(center - Raster.sampleBilinear(src,
      (8.0 + 50000.0 / 111194.9 / 2 - 0.0) - 0.5, 0.0) ) < 10.0) // sanity envelope
    // all interior pixels sampled (no NaN)
    assert((4 until 12).forall(y => (4 until 12).forall(x => !dst(x, y).isNaN)))
    // pixels far outside the source extent are NaN
    val far = Raster.reproject(src, proj, Georef(5000000.0, 800000.0, 100000.0), 4, 4)
    assert(far.values.forall(_.isNaN))
  }

  test("GeoTIFF round-trip: float32 grid, georef tags, both byte orders read") {
    val rng = new SplitMix64(9)
    val g = mkGrid(23, 11, (_, _) => math.floor(rng.nextDouble() * 1000) / 4.0,
      Georef(-120.5, 49.25, 0.125))
    val bytes = GeoTiff.write(g)
    val back = GeoTiff.read(bytes)
    assert(back.w == g.w && back.h == g.h)
    assert(back.georef == g.georef)
    assert(back.values.sameElements(g.values)) // x/4 values are float-exact
  }
}
