package graft.index

import graft.geom.Geom

/**
 * Immutable struct-of-arrays polygon layer, designed to be broadcast to
 * executors as one compact blob (the Spark analog of the reference's
 * `ArcCollection` + `PathIndex`: SoA coordinate arrays
 * `/root/reference/src/paths/mapshaper-arcs.mjs:57-63`, packed R-tree over
 * ring bboxes + per-ring point-in-polygon `src/paths/mapshaper-path-index.mjs:9-237`).
 *
 * Layout:
 *  - `xx`, `yy`: concatenated vertex coords of all rings (closed: first==last);
 *  - `ringStart`: nRings+1 offsets into xx/yy;
 *  - `ringShape`: ring -> shape (polygon feature) index;
 *  - `ringBoxes`: 4 doubles per ring (minX, minY, maxX, maxY);
 *  - per-ring x-bucketed segment index for large rings (mirrors the adaptive
 *    hot-spot heuristic of `PathIndex` / `PolygonIndex`,
 *    `src/paths/mapshaper-path-index.mjs:155-173`,
 *    `src/polygons/mapshaper-polygon-index.mjs:9-131`).
 *
 * Point-in-shape semantics: even-odd across the shape's rings with boundary
 * counted as enclosed (`path-index.mjs:176-188`) — holes need no special
 * casing, parity handles them.
 */
final class PolygonLayer(
    val xx: Array[Double],
    val yy: Array[Double],
    val ringStart: Array[Int],
    val ringShape: Array[Int],
    val numShapes: Int,
    val shapeKeys: Array[Long] // external polygon ids, one per shape
) extends Serializable {

  val numRings: Int = ringShape.length

  val ringBoxes: Array[Double] = {
    val b = new Array[Double](numRings * 4)
    var r = 0
    while (r < numRings) {
      val (x0, y0, x1, y1) = Geom.bounds(xx, yy, ringStart(r), ringStart(r + 1) - ringStart(r))
      b(r * 4) = x0; b(r * 4 + 1) = y0; b(r * 4 + 2) = x1; b(r * 4 + 3) = y1
      r += 1
    }
    b
  }

  /** Layer extent (minX, minY, maxX, maxY). */
  val extent: (Double, Double, Double, Double) = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    var r = 0
    while (r < numRings) {
      if (ringBoxes(r * 4) < x0) x0 = ringBoxes(r * 4)
      if (ringBoxes(r * 4 + 1) < y0) y0 = ringBoxes(r * 4 + 1)
      if (ringBoxes(r * 4 + 2) > x1) x1 = ringBoxes(r * 4 + 2)
      if (ringBoxes(r * 4 + 3) > y1) y1 = ringBoxes(r * 4 + 3)
      r += 1
    }
    (x0, y0, x1, y1)
  }

  @transient lazy val tree: StrTree = StrTree.build(ringBoxes)

  /** Uniform-grid PIP accelerator — the hot-path candidate index (probes the
   * R-tree replaced per guide §1.2 step 2; see [[GridPipIndex]] for the
   * exactness argument). Built lazily once per executor. */
  @transient lazy val grid: GridPipIndex = new GridPipIndex(this)

  /** Per-ring segment index, built lazily for rings above a size threshold. */
  @transient private lazy val ringIndexes: Array[RingSegmentIndex] = new Array[RingSegmentIndex](numRings)

  private final val IndexThreshold = 64 // segments; below this direct scan wins

  /** OUT / IN / ON classification of (x, y) against ring r, bbox-guarded. */
  def pointInRing(x: Double, y: Double, r: Int): Int = {
    val b = r * 4
    if (x < ringBoxes(b) || x > ringBoxes(b + 2) || y < ringBoxes(b + 1) || y > ringBoxes(b + 3)) return Geom.OUT
    val start = ringStart(r)
    val n = ringStart(r + 1) - start
    if (n - 1 >= IndexThreshold) {
      var idx = ringIndexes(r)
      if (idx == null) {
        idx = new RingSegmentIndex(xx, yy, start, n)
        ringIndexes(r) = idx
      }
      idx.pointInRing(x, y)
    } else {
      Geom.pointInRing(x, y, xx, yy, start, n)
    }
  }

  /**
   * Indexes of all shapes enclosing (x, y); boundary counts as enclosed.
   * Candidate rings come from the packed R-tree; rings are grouped by shape
   * and combined even-odd (mirrors `findEnclosingShapes` + `testPointInRings`).
   */
  def findShapes(x: Double, y: Double): Array[Int] =
    grid.findShapeIdxs(x, y)

  /** Tree-path variant of [[findShapes]] — kept as the independent
   * implementation the grid index is asserted against (IndexSpec). */
  def findShapesTree(x: Double, y: Double): Array[Int] = {
    var inShapes: List[Int] = Nil
    // accumulate parity + boundary per candidate shape
    val cand = tree.search(x, y, x, y)
    if (cand.isEmpty) return Array.emptyIntArray
    java.util.Arrays.sort(cand)
    var i = 0
    while (i < cand.length) {
      val shape = ringShape(cand(i))
      var isIn = false
      var isOn = false
      var j = i
      while (j < cand.length && ringShape(cand(j)) == shape) {
        pointInRing(x, y, cand(j)) match {
          case Geom.ON => isOn = true
          case Geom.IN => isIn = !isIn
          case _       =>
        }
        j += 1
      }
      if (isOn || isIn) inShapes = shape :: inShapes
      i = j
    }
    inShapes.reverse.toArray
  }

  /** First (lowest shape index) enclosing shape, or -1. */
  def findFirstShape(x: Double, y: Double): Int = {
    val s = findShapes(x, y)
    if (s.isEmpty) -1 else s(0)
  }

  // ------------------------------------------------------------ hot path ----
  // Allocation-free probes for codegen expressions: per-thread scratch arrays,
  // no boxing, no builders. These are the per-row entry points of the
  // broadcast spatial join at 10^8+ rows.

  @transient private lazy val candScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](256))
  @transient private lazy val stackScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](128))
  @transient private lazy val keysScratch: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](64))
  private val emptyKeys = Array.emptyLongArray

  /** Candidate rings (sorted ascending) into thread-local scratch; returns count. */
  private def candidates(x: Double, y: Double): (Array[Int], Int) = {
    var cand = candScratch.get()
    var stack = stackScratch.get()
    var n = tree.searchInto(x, y, x, y, cand, stack)
    while (n < 0) { // grow and retry (rare)
      cand = new Array[Int](cand.length * 2)
      stack = new Array[Int](stack.length * 2)
      candScratch.set(cand)
      stackScratch.set(stack)
      n = tree.searchInto(x, y, x, y, cand, stack)
    }
    java.util.Arrays.sort(cand, 0, n)
    (cand, n)
  }

  /** Key of the first enclosing shape, or -1. Zero allocation on the fast
   * path (grid cell lookup; segment tests only in boundary-crossed cells).
   * The [[PolygonLayer.useGrid]] switch keeps the tree path reachable for
   * in-session A/B timing (one predictable branch per probe). */
  def findFirstKey(x: Double, y: Double): Long =
    if (PolygonLayer.useGrid) grid.findFirstKey(x, y) else findFirstKeyTree(x, y)

  /** Tree-path variant of [[findFirstKey]] (verification reference). */
  def findFirstKeyTree(x: Double, y: Double): Long = {
    val (cand, n) = candidates(x, y)
    var i = 0
    while (i < n) {
      val shape = ringShape(cand(i))
      var isIn = false
      var isOn = false
      var j = i
      while (j < n && ringShape(cand(j)) == shape) {
        val r = pointInRing(x, y, cand(j))
        if (r == Geom.ON) isOn = true
        else if (r == Geom.IN) isIn = !isIn
        j += 1
      }
      if (isOn || isIn) return shapeKeys(shape)
      i = j
    }
    -1L
  }

  /** Keys of all enclosing shapes (ascending shape order). Allocates only the
   * result array (exact-sized; empty result is a shared constant). */
  def findKeys(x: Double, y: Double): Array[Long] =
    if (PolygonLayer.useGrid) grid.findKeys(x, y) else findKeysTree(x, y)

  /** Tree-path variant of [[findKeys]] (verification reference). */
  def findKeysTree(x: Double, y: Double): Array[Long] = {
    val (cand, n) = candidates(x, y)
    if (n == 0) return emptyKeys
    var keys = keysScratch.get()
    var nk = 0
    var i = 0
    while (i < n) {
      val shape = ringShape(cand(i))
      var isIn = false
      var isOn = false
      var j = i
      while (j < n && ringShape(cand(j)) == shape) {
        val r = pointInRing(x, y, cand(j))
        if (r == Geom.ON) isOn = true
        else if (r == Geom.IN) isIn = !isIn
        j += 1
      }
      if (isOn || isIn) {
        if (nk == keys.length) { // grow: >scratch-size overlapping shapes
          keys = java.util.Arrays.copyOf(keys, keys.length * 2)
          keysScratch.set(keys)
        }
        keys(nk) = shapeKeys(shape)
        nk += 1
      }
      i = j
    }
    if (nk == 0) emptyKeys
    else java.util.Arrays.copyOf(keys, nk)
  }

  /** Planar signed area of a shape = sum of its rings' signed areas. */
  @transient private lazy val keyToShape: java.util.HashMap[Long, Int] = {
    val m = new java.util.HashMap[Long, Int](numShapes * 2)
    var s = 0
    while (s < numShapes) {
      if (!m.containsKey(shapeKeys(s))) m.put(shapeKeys(s), s)
      s += 1
    }
    m
  }

  /** Unsigned distance from (x, y) to the nearest boundary segment of the
    * shape with external key `key` — the reference's
    * `geom.getPointToShapeDistance` (mapshaper-path-geom.mjs:53, min over
    * all ring segments, holes included), used by `-fuzzy-join` tie
    * resolution. Infinity when the key is unknown. */
  def boundaryDistanceByKey(x: Double, y: Double, key: Long): Double = {
    val s = keyToShape.getOrDefault(key, -1)
    if (s < 0) return Double.PositiveInfinity
    var best = Double.PositiveInfinity
    var r = 0
    while (r < numRings) {
      if (ringShape(r) == s) {
        var i = ringStart(r)
        val end = ringStart(r + 1) - 1
        while (i < end) {
          val d = Geom.pointSegDistSq(x, y, xx(i), yy(i), xx(i + 1), yy(i + 1))
          if (d < best) best = d
          i += 1
        }
      }
      r += 1
    }
    math.sqrt(best)
  }

  def shapeArea(shape: Int): Double = {
    var sum = 0.0
    var r = 0
    while (r < numRings) {
      if (ringShape(r) == shape)
        sum += Geom.signedRingArea(xx, yy, ringStart(r), ringStart(r + 1) - ringStart(r))
      r += 1
    }
    sum
  }
}

/**
 * X-bucketed segment index for one ring, mirroring the reference's
 * `PolygonIndex` (`src/polygons/mapshaper-polygon-index.mjs:9-131`): segments
 * are bucketed by min-x; segments spanning more than one bucket go to an
 * overflow list; a vertical-ray query at x scans the bucket containing x, the
 * one to its left, and the overflow list.
 */
final class RingSegmentIndex(xx: Array[Double], yy: Array[Double], start: Int, n: Int) {
  private val segCount = n - 1
  private val nBuckets = math.max(4, math.ceil(math.pow(segCount.toDouble, 0.75) / 10.0).toInt)
  private val (x0, bucketWidth) = {
    var mn = Double.MaxValue
    var mx = Double.MinValue
    var i = start
    while (i < start + n) {
      if (xx(i) < mn) mn = xx(i)
      if (xx(i) > mx) mx = xx(i)
      i += 1
    }
    (mn, math.max((mx - mn) / nBuckets, java.lang.Double.MIN_NORMAL))
  }
  // bucket -> array of segment start offsets (segment i = vertices i, i+1)
  private val buckets: Array[Array[Int]] = {
    val tmp = Array.fill(nBuckets)(Array.newBuilder[Int])
    val ovf = Array.newBuilder[Int]
    var i = start
    while (i < start + n - 1) {
      val lo = math.min(xx(i), xx(i + 1))
      val hi = math.max(xx(i), xx(i + 1))
      val bLo = bucketOf(lo)
      val bHi = bucketOf(hi)
      if (bHi - bLo <= 1) tmp(bLo) += i else ovf += i
      i += 1
    }
    tmp.map(_.result()) :+ ovf.result()
  }

  @inline private def bucketOf(x: Double): Int = {
    val b = ((x - x0) / bucketWidth).toInt
    if (b < 0) 0 else if (b >= nBuckets) nBuckets - 1 else b
  }

  /** OUT / IN / ON via vertical-ray parity over candidate segments only. */
  def pointInRing(x: Double, y: Double): Int = {
    var isIn = false
    var isOn = false
    val b = bucketOf(x)
    var k = 0
    while (k < 3) {
      val arr = k match {
        case 0 => buckets(b)
        case 1 => if (b - 1 >= 0) buckets(b - 1) else Array.emptyIntArray
        case _ => buckets(nBuckets) // overflow
      }
      var j = 0
      while (j < arr.length) {
        val i = arr(j)
        val r = Geom.rayIntersection(x, y, xx(i), yy(i), xx(i + 1), yy(i + 1))
        if (r == 1) isIn = !isIn
        else if (r == Geom.ON) isOn = true
        j += 1
      }
      k += 1
    }
    if (isOn) Geom.ON else if (isIn) Geom.IN else Geom.OUT
  }
}

object PolygonLayer {

  /** Probe-path selector: grid index (default) vs packed-R-tree reference
   * path. Both are exact and asserted equal (IndexSpec); the switch exists
   * so measurements can A/B the two inside one session. */
  @volatile var useGrid: Boolean = true

  /** Build from shapes: each shape = (key, rings), ring = flat Array of (x, y) pairs, closed. */
  def fromShapes(shapes: Seq[(Long, Seq[Array[Double]])]): PolygonLayer = {
    val bxx = Array.newBuilder[Double]
    val byy = Array.newBuilder[Double]
    val rs = Array.newBuilder[Int]
    val rshape = Array.newBuilder[Int]
    val keys = Array.newBuilder[Long]
    var off = 0
    rs += 0
    var shapeIdx = 0
    shapes.foreach { case (key, rings) =>
      keys += key
      rings.foreach { ring =>
        require(ring.length % 2 == 0 && ring.length >= 8, "ring must be closed with >= 4 points")
        var i = 0
        while (i < ring.length) {
          bxx += ring(i)
          byy += ring(i + 1)
          i += 2
        }
        off += ring.length / 2
        rs += off
        rshape += shapeIdx
      }
      shapeIdx += 1
    }
    new PolygonLayer(bxx.result(), byy.result(), rs.result(), rshape.result(), shapeIdx, keys.result())
  }
}
