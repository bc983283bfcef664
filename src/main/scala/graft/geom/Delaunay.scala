package graft.geom

import scala.collection.mutable

/**
 * Delaunay triangulation (Bowyer–Watson) + alpha shapes — the reference's
 * `-alpha-shapes` builds concave hulls by filtering Delaunay triangles by
 * edge length (`/root/reference/src/commands/mapshaper-alpha-shapes.mjs:14-30`,
 * via the delaunator library). This is a fresh O(n²)-ish incremental
 * implementation, adequate for the per-feature / per-cluster point sets the
 * operator runs on (the distributed driver maps it per group).
 */
object Delaunay {

  /** Triangles as packed index triples (CCW). */
  def triangulate(xs: Array[Double], ys: Array[Double]): Array[Int] = {
    val n = xs.length
    if (n < 3) return Array.emptyIntArray

    // super-triangle enclosing all points
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    var i = 0
    while (i < n) {
      x0 = math.min(x0, xs(i)); x1 = math.max(x1, xs(i))
      y0 = math.min(y0, ys(i)); y1 = math.max(y1, ys(i))
      i += 1
    }
    val d = math.max(x1 - x0, y1 - y0) * 10 + 1
    val px = new Array[Double](n + 3)
    val py = new Array[Double](n + 3)
    System.arraycopy(xs, 0, px, 0, n)
    System.arraycopy(ys, 0, py, 0, n)
    px(n) = x0 - d; py(n) = y0 - d
    px(n + 1) = x0 + 2 * d; py(n + 1) = y0 - d
    px(n + 2) = x0; py(n + 2) = y0 + 2 * d

    // triangle store: each is (a, b, c)
    var tris = mutable.ArrayBuffer[(Int, Int, Int)]((n, n + 1, n + 2))

    i = 0
    while (i < n) {
      val bad = tris.filter { case (a, b, c) => inCircumcircle(px, py, a, b, c, px(i), py(i)) }
      if (bad.nonEmpty) {
        // boundary of the cavity = edges appearing once among bad triangles
        val edgeCount = mutable.HashMap.empty[(Int, Int), Int]
        bad.foreach { case (a, b, c) =>
          Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
            val k = if (u < v) (u, v) else (v, u)
            edgeCount.update(k, edgeCount.getOrElse(k, 0) + 1)
          }
        }
        tris = tris.filterNot(bad.contains)
        bad.foreach { case (a, b, c) =>
          Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
            val k = if (u < v) (u, v) else (v, u)
            if (edgeCount(k) == 1) {
              // new triangle (u, v, i) oriented CCW
              if (Geom.orient2d(px(u), py(u), px(v), py(v), px(i), py(i)) > 0)
                tris += ((u, v, i))
              else
                tris += ((v, u, i))
            }
          }
        }
      }
      i += 1
    }

    val out = Array.newBuilder[Int]
    tris.foreach { case (a, b, c) =>
      if (a < n && b < n && c < n) { out += a; out += b; out += c }
    }
    out.result()
  }

  /** Robust-enough in-circumcircle test for CCW triangle (abc). */
  private def inCircumcircle(px: Array[Double], py: Array[Double],
                             a: Int, b: Int, c: Int, x: Double, y: Double): Boolean = {
    // ensure CCW orientation for the determinant sign convention
    val ccw = Geom.orient2d(px(a), py(a), px(b), py(b), px(c), py(c)) > 0
    val (i1, i2, i3) = if (ccw) (a, b, c) else (a, c, b)
    val ax = px(i1) - x; val ay = py(i1) - y
    val bx = px(i2) - x; val by = py(i2) - y
    val cx = px(i3) - x; val cy = py(i3) - y
    val det =
      (ax * ax + ay * ay) * (bx * cy - cx * by) -
      (bx * bx + by * by) * (ax * cy - cx * ay) +
      (cx * cx + cy * cy) * (ax * by - bx * ay)
    det > 0
  }

  /** Circumradius of a triangle. */
  def circumradius(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double = {
    val la = Geom.distance(bx, by, cx, cy)
    val lb = Geom.distance(ax, ay, cx, cy)
    val lc = Geom.distance(ax, ay, bx, by)
    val area = Geom.triangleArea(ax, ay, bx, by, cx, cy)
    if (area == 0) Double.PositiveInfinity else la * lb * lc / (4 * area)
  }

  /**
   * Alpha shape: keep triangles whose LONGEST EDGE <= maxEdge (the
   * reference's edge-length filter); boundary = edges on exactly one kept
   * triangle, assembled into rings.
   */
  def alphaShape(xs: Array[Double], ys: Array[Double], maxEdge: Double): Seq[Array[Double]] = {
    val tris = triangulate(xs, ys)
    val parity = mutable.HashMap.empty[(Int, Int), Int]
    var i = 0
    while (i + 2 < tris.length) {
      val a = tris(i); val b = tris(i + 1); val c = tris(i + 2)
      val keep =
        Geom.distance(xs(a), ys(a), xs(b), ys(b)) <= maxEdge &&
        Geom.distance(xs(b), ys(b), xs(c), ys(c)) <= maxEdge &&
        Geom.distance(xs(a), ys(a), xs(c), ys(c)) <= maxEdge
      if (keep) {
        Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
          val k = if (u < v) (u, v) else (v, u)
          val cnt = parity.getOrElse(k, 0) + 1
          if (cnt == 2) parity.remove(k) else parity.update(k, cnt)
        }
      }
      i += 3
    }
    val edges = parity.keysIterator.map { case (u, v) =>
      Array(xs(u), ys(u), xs(v), ys(v))
    }.toArray
    graft.operators.RingAssembly.assemble(edges).toSeq
  }
}
