package graft

import graft.geom.{Geom, Overlay}
import graft.operators.Grids
import graft.tables.SplitMix64

class HexCleanSpec extends SparkSuite {

  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Array[Double] =
    Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1)

  test("hexCoord assigns every point to its NEAREST hex center") {
    val size = 3.0
    val rng = new SplitMix64(12)
    for (_ <- 0 until 2000) {
      val x = rng.nextDouble() * 100
      val y = rng.nextDouble() * 100
      val (q, r) = Grids.hexCoord(x, y, size)
      val (cx, cy) = Grids.hexCenter(q, r, size)
      val d0 = Geom.distance(x, y, cx, cy)
      // no neighboring hex center is closer
      for (dq <- -1 to 1; dr <- -1 to 1 if dq != 0 || dr != 0) {
        val (nx, ny) = Grids.hexCenter(q + dq, r + dr, size)
        assert(Geom.distance(x, y, nx, ny) >= d0 - 1e-9)
      }
    }
  }

  test("hex ring has the exact hexagon area and contains its center") {
    val ring = Grids.hexRing(10, 10, 2.0)
    val n = ring.length / 2
    val xs = Array.tabulate(n)(i => ring(i * 2))
    val ys = Array.tabulate(n)(i => ring(i * 2 + 1))
    val a = Geom.signedRingArea(xs, ys, 0, n)
    assert(math.abs(a - 3.0 * math.sqrt(3.0) / 2.0 * 4.0) < 1e-9)
    assert(Geom.pointInRing(10, 10, xs, ys, 0, n) == Geom.IN)
  }

  test("hexGrid covers the bbox: every probe point falls in a generated hex") {
    val g = Grids.hexGrid(spark, 0, 0, 30, 30, size = 4.0).collect()
    val rng = new SplitMix64(13)
    for (_ <- 0 until 300) {
      val x = rng.nextDouble() * 30
      val y = rng.nextDouble() * 30
      val (q, r) = Grids.hexCoord(x, y, 4.0)
      assert(g.exists(row => row.getLong(0) == q && row.getLong(1) == r),
        s"($x,$y) -> ($q,$r) not generated")
    }
  }

  test("clean removes overlaps: disjoint output, union preserved, first wins") {
    val a: Overlay.Shape = Seq(rect(0, 0, 10, 10))
    val b: Overlay.Shape = Seq(rect(5, 0, 15, 10))
    val cleaned = Overlay.clean(Seq(a, b))
    assert(cleaned.size == 2)
    val a2 = Overlay.layerArea(cleaned(0))
    val b2 = Overlay.layerArea(cleaned(1))
    assert(math.abs(a2 - 100.0) < 1e-9) // first shape keeps the overlap
    assert(math.abs(b2 - 50.0) < 1e-9)  // second loses it
    assert(math.abs((a2 + b2) - 150.0) < 1e-9) // total = union, no double count
  }

  test("flat-top hexGrid (reference 'hex' orientation) covers the bbox") {
    import graft.operators.Grids
    import graft.geom.Overlay
    val hexes = Grids.hexGrid(spark, 0, 0, 30, 30, size = 3.0, flatTop = true)
      .select("ring").collect().map(_.getSeq[Double](0).toArray)
    val rng = new graft.tables.SplitMix64(77)
    (0 until 200).foreach { _ =>
      val px = rng.nextDouble() * 30
      val py = rng.nextDouble() * 30
      val n = hexes.count(r => Overlay.evenOddContains(Seq(r), px, py))
      assert(n >= 1, s"uncovered point ($px,$py)")
    }
    // flat-top: ring has vertices at angle 0 (x = cx + r)
    val first = hexes.head
    val cx = (0 until 6).map(i => first(i * 2)).sum / 6.0
    assert(hexes.exists(r => (0 until 6).exists(i => math.abs(r(i * 2 + 1) - (0 until 6).map(j => r(j * 2 + 1)).sum / 6.0) < 1e-9)))
  }
}
