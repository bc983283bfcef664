package graft.geom

/**
 * Visvalingam / Douglas-Peucker path simplification.
 *
 * Mirrors the reference semantics (`/root/reference/src/simplify/mapshaper-visvalingam.mjs`):
 *  - per-vertex "effective area" thresholds computed by repeated removal of the
 *    minimum-area vertex from a min-heap, with neighbor recomputation;
 *  - monotonicity enforced: a vertex never gets a lower threshold than the last
 *    removed vertex (visvalingam.mjs:62-70);
 *  - endpoints get +Infinity (never removed);
 *  - "scaled" variant converts the area metric to a linear equivalent:
 *    `sqrt(area) * 0.65` for interior vertices (visvalingam.mjs:142-150);
 *  - weighted metric `(1 - 0.7*cos) * area` favoring ~120° angles
 *    (visvalingam.mjs:96-127).
 *
 * This is a per-arc kernel: on Spark, each arc is one row `(arcId, xx, yy)` and
 * the kernel runs inside a map — embarrassingly parallel, no shuffle.
 */
object Simplify {

  /** Simplification method. */
  sealed trait Method
  case object Visvalingam extends Method
  case object WeightedVisvalingam extends Method
  case object DouglasPeucker extends Method

  /**
   * Compute per-vertex removal thresholds for one arc. Endpoints = +Inf.
   * Returned array has the same length as the input.
   */
  def thresholds(xx: Array[Double], yy: Array[Double], method: Method): Array[Double] = method match {
    case Visvalingam         => scaled(visvalingam(xx, yy, standardMetric))
    case WeightedVisvalingam => scaled(visvalingam(xx, yy, weightedMetric(0.7)))
    case DouglasPeucker      => douglasPeucker(xx, yy)
  }

  type Metric = (Double, Double, Double, Double, Double, Double) => Double

  val standardMetric: Metric = Geom.triangleArea

  def weightedMetric(k: Double): Metric =
    (ax, ay, bx, by, cx, cy) => {
      val area = Geom.triangleArea(ax, ay, bx, by, cx, cy)
      val cos = Geom.cosine(ax, ay, bx, by, cx, cy)
      (1.0 - cos * k) * area
    }

  /** Convert area thresholds to linear equivalents (interior vertices only). */
  private def scaled(kk: Array[Double]): Array[Double] = {
    var i = 1
    while (i < kk.length - 1) {
      kk(i) = math.sqrt(kk(i)) * 0.65
      i += 1
    }
    kk
  }

  /** Core Visvalingam pass (mirrors `calcVisvalingam`). */
  def visvalingam(xx: Array[Double], yy: Array[Double], metric: Metric): Array[Double] =
    visvalingamIdx(xx.length,
      (b, c, d) => metric(xx(b), yy(b), xx(c), yy(c), xx(d), yy(d)))

  /** Shared min-heap Visvalingam loop over vertex INDICES — the 2D and 3D
   * (spherical) variants differ only in the metric closure. */
  private def visvalingamIdx(n: Int, metricAt: (Int, Int, Int) => Double): Array[Double] = {
    val kk = new Array[Double](n)
    if (n == 0) return kk
    val prev = new Array[Int](n)
    val next = new Array[Int](n)
    var c = 0
    while (c < n) {
      val b = c - 1
      val d = c + 1
      kk(c) = if (b < 0 || d >= n) Double.PositiveInfinity
              else metricAt(b, c, d)
      prev(c) = b
      next(c) = d
      c += 1
    }
    val heap = new MinHeap(kk)
    var maxVal = Double.NegativeInfinity
    var continue = true
    while (heap.size > 0 && continue) {
      val i = heap.pop()
      val v = kk(i)
      if (v == Double.PositiveInfinity) continue = false
      else {
        if (v < maxVal) kk(i) = maxVal // monotonicity clamp
        else maxVal = v
        val b = prev(i)
        val d = next(i)
        if (b > 0) heap.update(b, metricAt(prev(b), b, d))
        if (d < n - 1) heap.update(d, metricAt(b, d, next(d)))
        next(b max 0) = d
        if (d < n) prev(d) = b
      }
    }
    kk
  }

  // ------------------------------------------------ spherical (3D) variant

  type Metric3 = (Double, Double, Double, Double, Double, Double,
    Double, Double, Double) => Double

  val standardMetric3D: Metric3 = Geom.triangleArea3D

  def weightedMetric3D(k: Double): Metric3 =
    (ax, ay, az, bx, by, bz, cx, cy, cz) => {
      val area = Geom.triangleArea3D(ax, ay, az, bx, by, bz, cx, cy, cz)
      val cos = Geom.cosine3D(ax, ay, az, bx, by, bz, cx, cy, cz)
      (1.0 - cos * k) * area
    }

  def visvalingam3D(xx: Array[Double], yy: Array[Double], zz: Array[Double],
                    metric: Metric3): Array[Double] =
    visvalingamIdx(xx.length, (b, c, d) =>
      metric(xx(b), yy(b), zz(b), xx(c), yy(c), zz(c), xx(d), yy(d), zz(d)))

  /** DP thresholds in 3D: point-to-chord distance on the sphere's chord. */
  def douglasPeucker3D(xx: Array[Double], yy: Array[Double], zz: Array[Double]): Array[Double] = {
    val n = xx.length
    val kk = new Array[Double](n)
    if (n < 3) { var i = 0; while (i < n) { kk(i) = Double.PositiveInfinity; i += 1 }; return kk }
    kk(0) = Double.PositiveInfinity
    kk(n - 1) = Double.PositiveInfinity

    def perp3(p: Int, a: Int, b: Int): Double = {
      val ux = xx(b) - xx(a); val uy = yy(b) - yy(a); val uz = zz(b) - zz(a)
      val vx = xx(p) - xx(a); val vy = yy(p) - yy(a); val vz = zz(p) - zz(a)
      val len2 = ux * ux + uy * uy + uz * uz
      if (len2 == 0) Geom.distance3D(xx(p), yy(p), zz(p), xx(a), yy(a), zz(a))
      else {
        val cx = uy * vz - uz * vy
        val cy = uz * vx - ux * vz
        val cz = ux * vy - uy * vx
        math.sqrt((cx * cx + cy * cy + cz * cz) / len2)
      }
    }

    def seg(lo: Int, hi: Int, enclosing: Double): Unit = {
      if (hi - lo < 2) return
      var maxD = -1.0
      var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = perp3(i, lo, hi)
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      val t = math.min(maxD, enclosing)
      kk(maxI) = t
      seg(lo, maxI, t)
      seg(maxI, hi, t)
    }
    seg(0, n - 1, Double.PositiveInfinity)
    kk
  }

  /**
   * Spherical thresholds for an unprojected lon/lat path — the reference's
   * default for geographic data (`mapshaper-simplify.mjs:91-120`): vertices
   * go to XYZ on the WGS84-radius sphere and the SAME kernels run with 3D
   * metrics, so thresholds are in meters and behave correctly at poles and
   * near the antimeridian (where planar lon/lat geometry is distorted).
   */
  def sphericalThresholds(lon: Array[Double], lat: Array[Double], method: Method): Array[Double] = {
    val n = lon.length
    val xx = new Array[Double](n)
    val yy = new Array[Double](n)
    val zz = new Array[Double](n)
    val p = new Array[Double](3)
    var i = 0
    while (i < n) {
      Geom.lngLatToXYZ(lon(i), lat(i), p)
      xx(i) = p(0); yy(i) = p(1); zz(i) = p(2)
      i += 1
    }
    method match {
      case Visvalingam         => scaled(visvalingam3D(xx, yy, zz, standardMetric3D))
      case WeightedVisvalingam => scaled(visvalingam3D(xx, yy, zz, weightedMetric3D(0.7)))
      case DouglasPeucker      => douglasPeucker3D(xx, yy, zz)
    }
  }

  /**
   * World-edge protection (`mapshaper-simplify.mjs:168-177`): vertices on the
   * ±180 / ±90 frame (with 1e-12 rounding slack) get the path's max finite
   * threshold so they are never removed before interior detail — prevents
   * Antarctica-style outlines from detaching from the antimeridian.
   */
  def protectWorldEdges(lon: Array[Double], lat: Array[Double], kk: Array[Double]): Array[Double] = {
    val xmax = 180.0 - 1e-12; val ymax = 90.0 - 1e-12
    var lockZ = 0.0
    var locked = false
    var i = 0
    while (i < kk.length) {
      if (lon(i) >= xmax || lon(i) <= -xmax || lat(i) >= ymax || lat(i) <= -ymax) {
        if (!locked) {
          var m = 0.0
          var j = 0
          while (j < kk.length) {
            if (kk(j) > m && kk(j) < Double.PositiveInfinity) m = kk(j)
            j += 1
          }
          lockZ = m
          locked = true
        }
        if (kk(i) != Double.PositiveInfinity) kk(i) = lockZ
      }
      i += 1
    }
    kk
  }

  /** Douglas-Peucker thresholds: max perpendicular distance at split vertices. */
  def douglasPeucker(xx: Array[Double], yy: Array[Double]): Array[Double] = {
    val n = xx.length
    val kk = new Array[Double](n)
    if (n < 3) { var i = 0; while (i < n) { kk(i) = Double.PositiveInfinity; i += 1 }; return kk }
    kk(0) = Double.PositiveInfinity
    kk(n - 1) = Double.PositiveInfinity

    def seg(lo: Int, hi: Int, enclosing: Double): Unit = {
      if (hi - lo < 2) return
      var maxD = -1.0
      var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = perpDistance(xx(i), yy(i), xx(lo), yy(lo), xx(hi), yy(hi))
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      // cap at enclosing threshold to keep thresholds monotone along recursion
      val t = math.min(maxD, enclosing)
      kk(maxI) = t
      seg(lo, maxI, t)
      seg(maxI, hi, t)
    }
    seg(0, n - 1, Double.PositiveInfinity)
    kk
  }

  private def perpDistance(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0) Geom.distance(px, py, ax, ay)
    else math.abs((px - ax) * dy - (py - ay) * dx) / math.sqrt(len2)
  }

  /** Keep vertices whose threshold ≥ interval; endpoints always kept. */
  def filter(xx: Array[Double], yy: Array[Double], kk: Array[Double], interval: Double): (Array[Double], Array[Double]) = {
    val bx = Array.newBuilder[Double]
    val by = Array.newBuilder[Double]
    var i = 0
    while (i < xx.length) {
      if (kk(i) >= interval) { bx += xx(i); by += yy(i) }
      i += 1
    }
    (bx.result(), by.result())
  }

  /**
   * Array-backed binary min-heap over external values, with position tracking
   * for O(log n) `update` (mirrors `mapshaper-heap.mjs`).
   */
  /** Index-addressable binary min-heap. Ties on value break by smaller item
   * id, so the removal ORDER (and with it the clamped threshold sequence) is
   * fully deterministic — lattice-derived coordinates produce exact area
   * ties, and an arbitrary heap order would make simplification output
   * depend on heap internals. */
  final class MinHeap(values: Array[Double]) {
    private val n = values.length
    private val heap = new Array[Int](n)   // heap slot -> item id
    private val pos = new Array[Int](n)    // item id -> heap slot
    private var _size = n

    /** (value, id) lexicographic: a strictly-less-than b. */
    @inline private def lt(a: Int, b: Int): Boolean = {
      val va = values(a); val vb = values(b)
      va < vb || (va == vb && a < b)
    }
    locally {
      var i = 0
      while (i < n) { heap(i) = i; pos(i) = i; i += 1 }
      var j = n / 2 - 1
      while (j >= 0) { down(j); j -= 1 }
    }

    def size: Int = _size

    def pop(): Int = {
      val top = heap(0)
      _size -= 1
      if (_size > 0) {
        moveTo(heap(_size), 0)
        down(0)
      }
      top
    }

    def update(id: Int, value: Double): Unit = {
      values(id) = value
      val i = pos(id)
      if (i < _size) { up(i); down(pos(id)) }
    }

    @inline private def moveTo(id: Int, slot: Int): Unit = { heap(slot) = id; pos(id) = slot }

    private def up(i0: Int): Unit = {
      var i = i0
      val id = heap(i)
      while (i > 0) {
        val p = (i - 1) / 2
        if (!lt(id, heap(p))) return swapDone(i, id)
        moveTo(heap(p), i)
        i = p
      }
      moveTo(id, i)
    }

    @inline private def swapDone(i: Int, id: Int): Unit = moveTo(id, i)

    private def down(i0: Int): Unit = {
      var i = i0
      val id = heap(i)
      var continue = true
      while (continue) {
        var c = 2 * i + 1
        if (c >= _size) continue = false
        else {
          if (c + 1 < _size && lt(heap(c + 1), heap(c))) c += 1
          if (!lt(heap(c), id)) continue = false
          else { moveTo(heap(c), i); i = c }
        }
      }
      moveTo(id, i)
    }
  }
}
