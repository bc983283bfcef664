package graft.geom

import scala.collection.mutable

/**
 * `-filter-detail` — remove intricate sub-scale detail from one arc WITHOUT
 * thinning the rest of the line (`/root/reference/src/paths/
 * mapshaper-detail-filter.mjs`, design per its header comment):
 *
 *  1. IDENTIFY candidate runs with a chord-length-gated weighted-Visvalingam
 *     peel: the least-significant vertex (smallest angle-weighted triangle
 *     area) is removed first, and a vertex is only removable when the chord
 *     that would replace it is <= the detail distance D — cuts stay local.
 *  2. COMMIT selectively: a run of removed vertices between two survivors is
 *     collapsed to its chord only when the original sub-path is convoluted
 *     (tortuosity = length/chord >= threshold); gentle stretches are restored
 *     at full resolution.
 *  3. A ROUNDNESS gate protects substantial rounded loops: a candidate span
 *     closed by its chord is protected when enclosed-area / loop-perimeter
 *     >= roundness * D (thin needles enclose ~0 area and are still cut).
 *
 * Arc endpoints are always preserved (topology-safe like -simplify).
 */
object DetailFilter {

  final val DefaultWeighting = 0.7
  final val DefaultTortuosity = 4.0
  final val DefaultRoundness = 0.2

  /** Weighted Visvalingam metric (reference weighting semantics: flat angles
   * get down-weighted so spikes peel first). */
  private def weightedArea(xx: Array[Double], yy: Array[Double],
                           a: Int, b: Int, c: Int, weighting: Double): Double = {
    val area = Geom.triangleArea(xx(a), yy(a), xx(b), yy(b), xx(c), yy(c))
    val cos = Geom.cosine(xx(a), yy(a), xx(b), yy(b), xx(c), yy(c))
    val weight = weighting * (-cos) + 1.0 // same shape as weighted Visvalingam
    area * math.max(weight, 0.05)
  }

  def filter(xx: Array[Double], yy: Array[Double], distance: Double,
             tortuosity: Double = DefaultTortuosity,
             weighting: Double = DefaultWeighting,
             roundness: Double = DefaultRoundness): (Array[Double], Array[Double]) = {
    val n = xx.length
    if (n <= 2) return (xx.clone(), yy.clone())
    val prev = Array.tabulate(n)(i => i - 1)
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val removed = new Array[Boolean](n)

    // phase 1: chord-gated weighted peel (O(n^2) scan kernel — runs per arc)
    var changed = true
    while (changed) {
      changed = false
      var best = -1
      var bestArea = Double.MaxValue
      var i = next(0)
      while (i != -1 && next(i) != -1) {
        val p = prev(i); val q = next(i)
        val chord = Geom.distance(xx(p), yy(p), xx(q), yy(q))
        if (chord <= distance) {
          val a = weightedArea(xx, yy, p, i, q, weighting)
          if (a < bestArea) { bestArea = a; best = i }
        }
        i = next(i)
      }
      if (best != -1) {
        removed(best) = true
        next(prev(best)) = next(best)
        prev(next(best)) = prev(best)
        changed = true
      }
    }

    // phase 2: survivor MERGE — a spike with long bare flanks parks its base
    // vertices as survivors; when a near-degenerate closing chord
    // (chord <= MERGE_CHORD_FRACTION * D, tortuosity >= threshold, not
    // roundness-protected) exists within an arc-length window, remove the
    // intermediate survivors so the commit can slice the whole excursion
    // (reference constants MERGE_WINDOW_FACTOR=12, MERGE_CHORD_FRACTION=0.5)
    val prefixLen = new Array[Double](n)
    var pl = 1
    while (pl < n) {
      prefixLen(pl) = prefixLen(pl - 1) +
        Geom.distance(xx(pl - 1), yy(pl - 1), xx(pl), yy(pl))
      pl += 1
    }
    val window = 12.0 * distance
    val mergeChord = 0.5 * distance
    var u = 0
    while (u != -1 && next(u) != -1) {
      var v = next(u)
      var bestV = -1
      while (v != -1 && prefixLen(v) - prefixLen(u) <= window) {
        if (v != next(u)) {
          val chord = Geom.distance(xx(u), yy(u), xx(v), yy(v))
          if (chord <= mergeChord) {
            val len = prefixLen(v) - prefixLen(u)
            val tort = if (chord > 0) len / chord else Double.PositiveInfinity
            // enclosed area of the original sub-path closed by the chord
            var area2 = 0.0
            var k = u
            while (k < v) { area2 += xx(k) * yy(k + 1) - xx(k + 1) * yy(k); k += 1 }
            area2 += xx(v) * yy(u) - xx(u) * yy(v)
            val protectLoop = roundness > 0 &&
              math.abs(area2 / 2.0) / (len + chord) >= roundness * distance
            if (tort >= tortuosity && !protectLoop) bestV = v
          }
        }
        v = next(v)
      }
      if (bestV != -1) {
        // widen the run: drop intermediate survivors
        var k = next(u)
        while (k != bestV) { removed(k) = true; k = next(k) }
        next(u) = bestV
        prev(bestV) = u
      }
      u = next(u)
    }

    // phase 3: commit runs by tortuosity, protect round loops
    val outX = mutable.ArrayBuffer.empty[Double]
    val outY = mutable.ArrayBuffer.empty[Double]
    outX += xx(0); outY += yy(0)
    var s = 0
    while (next(s) != -1) {
      val e = next(s)
      if (e - s > 1) {
        // removed run (s, e): measure the original sub-path
        var len = 0.0
        var area2 = 0.0
        var k = s
        while (k < e) {
          len += Geom.distance(xx(k), yy(k), xx(k + 1), yy(k + 1))
          area2 += xx(k) * yy(k + 1) - xx(k + 1) * yy(k)
          k += 1
        }
        area2 += xx(e) * yy(s) - xx(s) * yy(e) // close with the chord
        val chord = Geom.distance(xx(s), yy(s), xx(e), yy(e))
        val tort = if (chord > 0) len / chord else Double.PositiveInfinity
        val loopPerimeter = len + chord
        val protectLoop = roundness > 0 && loopPerimeter > 0 &&
          math.abs(area2 / 2.0) / loopPerimeter >= roundness * distance
        if (tort < tortuosity || protectLoop) {
          // restore the run at full resolution
          var r = s + 1
          while (r < e) { outX += xx(r); outY += yy(r); r += 1 }
        }
      }
      outX += xx(e); outY += yy(e)
      s = e
    }
    (outX.toArray, outY.toArray)
  }
}
