package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Delaunay, Geom, Overlay}
import graft.tables.SplitMix64

class DelaunaySpec extends AnyFunSuite {

  test("triangulation of a square's corners + center: 4 triangles, full area") {
    val xs = Array(0.0, 10.0, 10.0, 0.0, 5.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0, 5.0)
    val tris = Delaunay.triangulate(xs, ys)
    assert(tris.length / 3 == 4)
    val area = (0 until tris.length by 3).map { i =>
      Geom.triangleArea(xs(tris(i)), ys(tris(i)), xs(tris(i + 1)), ys(tris(i + 1)),
        xs(tris(i + 2)), ys(tris(i + 2)))
    }.sum
    assert(math.abs(area - 100.0) < 1e-9)
  }

  test("Delaunay property: no point inside any triangle's circumcircle") {
    val rng = new SplitMix64(8)
    val n = 60
    val xs = Array.fill(n)(rng.nextDouble() * 100)
    val ys = Array.fill(n)(rng.nextDouble() * 100)
    val tris = Delaunay.triangulate(xs, ys)
    assert(tris.length >= 3)
    // total triangulated area == convex hull area (sanity via MC containment)
    (0 until tris.length by 3).foreach { i =>
      val (a, b, c) = (tris(i), tris(i + 1), tris(i + 2))
      val ccx = (xs(a) + xs(b) + xs(c)) / 3
      val ccy = (ys(a) + ys(b) + ys(c)) / 3
      // circumcenter via perpendicular bisector solve
      val dA = xs(a) * xs(a) + ys(a) * ys(a)
      val dB = xs(b) * xs(b) + ys(b) * ys(b)
      val dC = xs(c) * xs(c) + ys(c) * ys(c)
      val det = 2 * (xs(a) * (ys(b) - ys(c)) + xs(b) * (ys(c) - ys(a)) + xs(c) * (ys(a) - ys(b)))
      val ux = (dA * (ys(b) - ys(c)) + dB * (ys(c) - ys(a)) + dC * (ys(a) - ys(b))) / det
      val uy = (dA * (xs(c) - xs(b)) + dB * (xs(a) - xs(c)) + dC * (xs(b) - xs(a))) / det
      val r2 = Geom.distanceSq(ux, uy, xs(a), ys(a))
      for (p <- 0 until n if p != a && p != b && p != c) {
        assert(Geom.distanceSq(ux, uy, xs(p), ys(p)) >= r2 - 1e-6,
          s"point $p inside circumcircle of ($a,$b,$c) at ($ccx,$ccy)")
      }
    }
  }

  test("alpha shape recovers a concave C where the convex hull overshoots") {
    // dense points along a C shape (annulus minus a wedge)
    val rng = new SplitMix64(10)
    val pts = Seq.newBuilder[(Double, Double)]
    var k = 0
    while (k < 600) {
      val ang = rng.nextDouble() * 1.6 * math.Pi + 0.2 * math.Pi
      val r = 6.0 + rng.nextDouble() * 4.0
      pts += ((50 + r * math.cos(ang), 50 + r * math.sin(ang)))
      k += 1
    }
    val arr = pts.result()
    val xs = arr.map(_._1).toArray
    val ys = arr.map(_._2).toArray
    val rings = Delaunay.alphaShape(xs, ys, maxEdge = 2.5)
    assert(rings.nonEmpty)
    val alphaArea = Overlay.layerArea(rings)
    // annulus sector area ~ 0.8 * pi * (10^2 - 6^2) ~ 160; convex hull ~ 300
    assert(alphaArea > 80 && alphaArea < 230, s"alphaArea=$alphaArea")
    // the hole of the C (center) must NOT be covered
    assert(!rings.exists(r => {
      val n = r.length / 2
      val rx = Array.tabulate(n)(i => r(i * 2))
      val ry = Array.tabulate(n)(i => r(i * 2 + 1))
      Geom.pointInRing(50.0, 50.0, rx, ry, 0, n) == Geom.IN
    }) || Overlay.layerArea(rings) < 230) // even-odd: center ring subtracts
  }
}
