package graft.geom

/**
 * Per-path vertex operators: smoothing and densification — the reference's
 * `-smooth` (`/root/reference/src/commands/mapshaper-smooth.mjs:12-185`) and
 * `-densify` (`mapshaper-densify-command.mjs:9-186`) kernels. Like the
 * simplifier, these run per arc/ring inside a Spark map: embarrassingly
 * parallel, no shuffle.
 */
object PathOps {

  /**
   * One pass of endpoint-preserving Chaikin-style corner cutting blended by
   * `weight` in (0, 0.5]: each interior vertex v_i is replaced by two points
   * at v_i + weight*(v_{i±1} - v_i). Closed rings (first==last) smooth every
   * vertex; open paths keep endpoints fixed.
   */
  def smoothOnce(flat: Array[Double], weight: Double): Array[Double] = {
    val n = flat.length / 2
    if (n < 3) return flat
    val closed = flat(0) == flat(flat.length - 2) && flat(1) == flat(flat.length - 1)
    val out = Array.newBuilder[Double]
    val m = if (closed) n - 1 else n
    @inline def px(i: Int) = flat(((i % m) + m) % m * 2)
    @inline def py(i: Int) = flat(((i % m) + m) % m * 2 + 1)
    if (!closed) { out += flat(0); out += flat(1) }
    val start = if (closed) 0 else 1
    val end = if (closed) m else n - 1
    var i = start
    while (i < end) {
      val x = px(i); val y = py(i)
      out += x + weight * (px(i - 1) - x); out += y + weight * (py(i - 1) - y)
      out += x + weight * (px(i + 1) - x); out += y + weight * (py(i + 1) - y)
      i += 1
    }
    if (!closed) { out += flat(flat.length - 2); out += flat(flat.length - 1) }
    val res = out.result()
    if (closed) res ++ Array(res(0), res(1)) else res
  }

  /** Iterated smoothing. */
  def smooth(flat: Array[Double], weight: Double, iterations: Int): Array[Double] = {
    var cur = flat
    var i = 0
    while (i < iterations) { cur = smoothOnce(cur, weight); i += 1 }
    cur
  }

  /** Insert vertices so that no segment is longer than `interval` (planar). */
  def densify(flat: Array[Double], interval: Double): Array[Double] = {
    require(interval > 0)
    val out = Array.newBuilder[Double]
    var i = 0
    while (i + 3 < flat.length) {
      val x1 = flat(i); val y1 = flat(i + 1)
      val x2 = flat(i + 2); val y2 = flat(i + 3)
      out += x1; out += y1
      val d = Geom.distance(x1, y1, x2, y2)
      if (d > interval) {
        val k = math.ceil(d / interval).toInt
        var j = 1
        while (j < k) {
          val t = j.toDouble / k
          out += x1 + (x2 - x1) * t
          out += y1 + (y2 - y1) * t
          j += 1
        }
      }
      i += 2
    }
    out += flat(flat.length - 2); out += flat(flat.length - 1)
    out.result()
  }
}
