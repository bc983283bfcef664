package graft.operators

import graft.geom.Crs

/**
 * Raster kernels — the reference's raster toolbox re-expressed as pure
 * per-grid functions (they run inside `mapPartitions`/UDF stages, shuffle-free):
 *
 *  - [[boxBlur]]/[[gaussianBlur]] — `src/rasters/mapshaper-raster-blur.mjs`
 *    (iterated box blur approximating a Gaussian);
 *  - [[resampleBilinear]] — `browser-tests/raster-resampling-benchmark.spec.mjs`
 *    cases (uint8 RGB resample);
 *  - [[crop]] — bbox clip of grids (`mapshaper-clip-erase.mjs:139-161`);
 *  - [[reproject]] — inverse-projection resampling
 *    (`src/rasters/mapshaper-raster-reprojection.mjs`): each destination pixel
 *    is inverse-projected to lon/lat and sampled from the source grid.
 *
 * A grid is (w, h, values) + a georef mapping pixel (col, row) to world
 * coords: x = x0 + (col + 0.5) * cs, y = y1 - (row + 0.5) * cs (row 0 = top).
 */
object Raster {

  final case class Georef(x0: Double, y1: Double, cellSize: Double)

  final case class Grid(w: Int, h: Int, values: Array[Double], georef: Georef) {
    def apply(cx: Int, cy: Int): Double = values(cy * w + cx)
  }

  /** One box-blur pass (radius r, edge-clamped), separable two-pass. */
  def boxBlur(g: Grid, r: Int): Grid = {
    if (r <= 0) return g
    val tmp = new Array[Double](g.values.length)
    // horizontal
    var y = 0
    while (y < g.h) {
      var x = 0
      while (x < g.w) {
        var s = 0.0
        var k = -r
        while (k <= r) {
          val xx = math.max(0, math.min(g.w - 1, x + k))
          s += g.values(y * g.w + xx)
          k += 1
        }
        tmp(y * g.w + x) = s / (2 * r + 1)
        x += 1
      }
      y += 1
    }
    // vertical
    val out = new Array[Double](g.values.length)
    y = 0
    while (y < g.h) {
      var x = 0
      while (x < g.w) {
        var s = 0.0
        var k = -r
        while (k <= r) {
          val yy = math.max(0, math.min(g.h - 1, y + k))
          s += tmp(yy * g.w + x)
          k += 1
        }
        out(y * g.w + x) = s / (2 * r + 1)
        x += 1
      }
      y += 1
    }
    Grid(g.w, g.h, out, g.georef)
  }

  /** Gaussian approximation: three iterated box blurs (standard technique;
   * effective sigma ~ r * sqrt(iterations/3)). */
  def gaussianBlur(g: Grid, r: Int, iterations: Int = 3): Grid =
    (0 until iterations).foldLeft(g)((acc, _) => boxBlur(acc, r))

  /** Bilinear resample to (outW, outH); pixel centers aligned to the same
   * world extent (the georef cell size rescales accordingly). */
  def resampleBilinear(g: Grid, outW: Int, outH: Int): Grid = {
    val out = new Array[Double](outW * outH)
    val sx = g.w.toDouble / outW
    val sy = g.h.toDouble / outH
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        val fx = (x + 0.5) * sx - 0.5
        val fy = (y + 0.5) * sy - 0.5
        out(y * outW + x) = sampleBilinear(g, fx, fy)
        x += 1
      }
      y += 1
    }
    Grid(outW, outH, out, Georef(g.georef.x0, g.georef.y1, g.georef.cellSize * sx))
  }

  /** Bilinear sample at fractional pixel coords (edge-clamped). */
  def sampleBilinear(g: Grid, fx: Double, fy: Double): Double = {
    val x0 = math.floor(fx).toInt
    val y0 = math.floor(fy).toInt
    val tx = fx - x0
    val ty = fy - y0
    @inline def v(x: Int, y: Int): Double =
      g.values(math.max(0, math.min(g.h - 1, y)) * g.w + math.max(0, math.min(g.w - 1, x)))
    val a = v(x0, y0) * (1 - tx) + v(x0 + 1, y0) * tx
    val b = v(x0, y0 + 1) * (1 - tx) + v(x0 + 1, y0 + 1) * tx
    a * (1 - ty) + b * ty
  }

  /** Crop to a world-coordinate bbox (cells whose centers fall inside). */
  def crop(g: Grid, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Grid = {
    val cs = g.georef.cellSize
    val c0 = math.max(0, math.ceil((xmin - g.georef.x0) / cs - 0.5).toInt)
    val c1 = math.min(g.w - 1, math.floor((xmax - g.georef.x0) / cs - 0.5).toInt)
    val r0 = math.max(0, math.ceil((g.georef.y1 - ymax) / cs - 0.5).toInt)
    val r1 = math.min(g.h - 1, math.floor((g.georef.y1 - ymin) / cs - 0.5).toInt)
    val w = math.max(0, c1 - c0 + 1)
    val h = math.max(0, r1 - r0 + 1)
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(g.values, (r0 + y) * g.w + c0, out, y * w, w)
      y += 1
    }
    Grid(w, h, out, Georef(g.georef.x0 + c0 * cs, g.georef.y1 - r0 * cs, cs))
  }

  /**
   * Reproject a lon/lat grid into a projected grid: every destination pixel
   * center is INVERSE-projected to lon/lat and bilinearly sampled from the
   * source — the same pull-resampling the reference implements.
   */
  def reproject(src: Grid, proj: Crs.Proj,
                dstGeoref: Georef, dstW: Int, dstH: Int): Grid = {
    val out = new Array[Double](dstW * dstH)
    val cs = dstGeoref.cellSize
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        val px = dstGeoref.x0 + (x + 0.5) * cs
        val py = dstGeoref.y1 - (y + 0.5) * cs
        val (lon, lat) = proj.inverse(px, py)
        val fx = (lon - src.georef.x0) / src.georef.cellSize - 0.5
        val fy = (src.georef.y1 - lat) / src.georef.cellSize - 0.5
        out(y * dstW + x) =
          if (fx < -0.5 || fy < -0.5 || fx > src.w - 0.5 || fy > src.h - 0.5) Double.NaN
          else sampleBilinear(src, fx, fy)
        x += 1
      }
      y += 1
    }
    Grid(dstW, dstH, out, dstGeoref)
  }
}
