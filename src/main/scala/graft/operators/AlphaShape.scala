package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.{Delaunay, Geom}

/**
 * Distributed alpha shapes — the scale path for the reference's
 * `-alpha-shapes` (`/root/reference/src/commands/mapshaper-alpha-shapes.mjs`),
 * replacing the round-1 collect-everything driver kernel.
 *
 * Criterion: the ALPHA COMPLEX — keep Delaunay triangles with circumradius
 * <= alpha. This (unlike a bare longest-edge filter) gives an exact locality
 * bound, which is what makes the operator partitionable:
 *
 *   With square cells of side 2*alpha, a kept triangle's circumcircle
 *   (radius <= alpha) centered in cell C is contained in C's 3x3 block. So a
 *   local Delaunay over the 3x3 block decides the triangle EXACTLY: the
 *   circumcircle-empty test sees every global point that could violate it,
 *   and each triangle is emitted only by the cell owning its circumcenter
 *   (half-open boxes) — once, globally consistent.
 *
 * Stages: points -> 3x3 cell gather (explode 9 neighbor offsets, one shuffle)
 * -> per-cell Bowyer-Watson + circumradius/ownership filter -> global edge
 * parity (groupBy) -> boundary edges (count==1) -> driver ring assembly.
 * Only the boundary (O(perimeter), not O(n)) is ever collected.
 */
object AlphaShape {

  /** Single-node alpha-complex triangles: packed (a,b,c) index triples with
   * circumradius <= alpha. The distributed path must reproduce these. */
  def complexTriangles(xs: Array[Double], ys: Array[Double], alpha: Double): Array[Int] = {
    val tris = Delaunay.triangulate(xs, ys)
    val out = Array.newBuilder[Int]
    var i = 0
    while (i + 2 < tris.length) {
      val a = tris(i); val b = tris(i + 1); val c = tris(i + 2)
      // same radius arithmetic as the distributed path (circumcenter distance)
      // so threshold decisions are bit-identical between the two
      val (ccx, ccy) = Geom.circumcenter(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
      if (Geom.distance(ccx, ccy, xs(a), ys(a)) <= alpha) {
        out += a; out += b; out += c
      }
      i += 3
    }
    out.result()
  }

  /** Boundary edges (on exactly one kept triangle) of a triangle soup given
   * as coordinate sextuples; returns [x1,y1,x2,y2] quads. */
  def boundaryEdges(triCoords: Iterator[Array[Double]]): Array[Array[Double]] = {
    val parity = mutable.HashMap.empty[(Double, Double, Double, Double), Int]
    triCoords.foreach { t =>
      var e = 0
      while (e < 3) {
        val (x1, y1) = (t(e * 2), t(e * 2 + 1))
        val (x2, y2) = (t(((e + 1) % 3) * 2), t(((e + 1) % 3) * 2 + 1))
        val k = if (x1 < x2 || (x1 == x2 && y1 < y2)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
        val c = parity.getOrElse(k, 0) + 1
        if (c == 2) parity.remove(k) else parity.update(k, c)
        e += 1
      }
    }
    parity.keysIterator.map { case (x1, y1, x2, y2) => Array(x1, y1, x2, y2) }.toArray
  }

  /** Single-node alpha shape rings via the alpha complex. */
  def rings(xs: Array[Double], ys: Array[Double], alpha: Double): Seq[Array[Double]] = {
    val tris = complexTriangles(xs, ys, alpha)
    val coords = (0 until tris.length / 3).iterator.map { t =>
      val (a, b, c) = (tris(t * 3), tris(t * 3 + 1), tris(t * 3 + 2))
      Array(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
    }
    assembleSorted(boundaryEdges(coords))
  }

  /** Deterministic assembly: edges sorted canonically first, rings sorted by
   * (minx, miny, vertex count) — output independent of hash/arrival order. */
  private def assembleSorted(edges: Array[Array[Double]]): Seq[Array[Double]] = {
    val sorted = edges.sortBy(e => (e(0), e(1), e(2), e(3)))
    RingAssembly.assemble(sorted).toSeq
      .sortBy { r =>
        var mx = Double.MaxValue; var my = Double.MaxValue
        var i = 0
        while (i + 1 < r.length) { mx = math.min(mx, r(i)); my = math.min(my, r(i + 1)); i += 2 }
        (mx, my, r.length)
      }
  }

  /**
   * Distributed alpha-complex boundary + rings. Input: (x, y) columns.
   * Returns the assembled rings (driver-side; O(boundary) data collected).
   */
  def distributedRings(spark: SparkSession, points: DataFrame,
                       xCol: String, yCol: String, alpha: Double): Seq[Array[Double]] = {
    import spark.implicits._
    val cs = 2.0 * alpha
    val pts = points.select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))

    // gather: every point goes to its own cell + 8 neighbors (one shuffle)
    val offsets = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)).toDF("dx", "dy")
    val gathered = pts
      .withColumn("hx", floor(col("x") / cs).cast("long"))
      .withColumn("hy", floor(col("y") / cs).cast("long"))
      .crossJoin(broadcast(offsets))
      .select((col("hx") + col("dx")).as("cx"), (col("hy") + col("dy")).as("cy"),
        col("x"), col("y"))

    // per-cell kernel: local Delaunay over the 3x3 block, keep triangles with
    // circumradius <= alpha whose circumcenter falls in THIS cell's half-open box
    val triCoords = gathered
      .groupByKey(r => (r.getLong(0), r.getLong(1)))
      .flatMapGroups { (key: (Long, Long), it: Iterator[org.apache.spark.sql.Row]) =>
        val (cx, cy) = key
        // sort: the triangulation must be a deterministic function of the SET
        val buf = it.map(r => (r.getDouble(2), r.getDouble(3))).toArray.sorted
        val xs = buf.map(_._1); val ys = buf.map(_._2)
        val x0 = cx * cs; val y0 = cy * cs
        if (xs.length < 3) Iterator.empty
        else {
          val tris = Delaunay.triangulate(xs, ys)
          (0 until tris.length / 3).iterator.flatMap { t =>
            val (a, b, c) = (tris(t * 3), tris(t * 3 + 1), tris(t * 3 + 2))
            val (ccx, ccy) = Geom.circumcenter(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
            val r = Geom.distance(ccx, ccy, xs(a), ys(a))
            if (r <= alpha && ccx >= x0 && ccx < x0 + cs && ccy >= y0 && ccy < y0 + cs)
              Iterator(Array(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c)))
            else Iterator.empty
          }
        }
      }

    // global boundary parity: canonical edge -> count; boundary = count 1
    val edges = triCoords.flatMap { t =>
      (0 until 3).map { e =>
        val (x1, y1) = (t(e * 2), t(e * 2 + 1))
        val (x2, y2) = (t(((e + 1) % 3) * 2), t(((e + 1) % 3) * 2 + 1))
        if (x1 < x2 || (x1 == x2 && y1 < y2)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
      }
    }.toDF("x1", "y1", "x2", "y2")
      .groupBy("x1", "y1", "x2", "y2").count()
      .filter(col("count") === 1)
      .select("x1", "y1", "x2", "y2")
      .as[(Double, Double, Double, Double)]
      .collect()
      .map { case (x1, y1, x2, y2) => Array(x1, y1, x2, y2) }

    assembleSorted(edges)
  }
}
