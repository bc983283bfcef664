package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Geom, PathOps, RectClip}

class PathOpsSpec extends AnyFunSuite {

  test("densify: no segment exceeds interval; endpoints preserved") {
    val path = Array(0.0, 0.0, 10.0, 0.0, 10.0, 5.0)
    val d = PathOps.densify(path, 1.0)
    assert(d(0) == 0.0 && d(1) == 0.0)
    assert(d(d.length - 2) == 10.0 && d(d.length - 1) == 5.0)
    var i = 0
    while (i + 3 < d.length) {
      assert(Geom.distance(d(i), d(i + 1), d(i + 2), d(i + 3)) <= 1.0 + 1e-12)
      i += 2
    }
    assert(d.length / 2 == 16) // 10 + 5 segments + endpoints
  }

  test("smooth: open path keeps endpoints, reduces corner sharpness") {
    val path = Array(0.0, 0.0, 5.0, 0.0, 5.0, 5.0) // right angle at (5,0)
    val s = PathOps.smooth(path, 0.25, 2)
    assert(s(0) == 0.0 && s(1) == 0.0)
    assert(s(s.length - 2) == 5.0 && s(s.length - 1) == 5.0)
    // smoothed path never passes exactly through the sharp corner
    var minD = Double.MaxValue
    var i = 0
    while (i < s.length) {
      minD = math.min(minD, Geom.distance(s(i), s(i + 1), 5.0, 0.0))
      i += 2
    }
    assert(minD > 0.5)
  }

  test("smooth: closed ring stays closed") {
    val ring = Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0)
    val s = PathOps.smoothOnce(ring, 0.25)
    assert(s(0) == s(s.length - 2) && s(1) == s(s.length - 1))
    // area shrinks slightly but stays close
    val n = s.length / 2
    val xx = Array.tabulate(n)(i => s(i * 2))
    val yy = Array.tabulate(n)(i => s(i * 2 + 1))
    val a = Geom.signedRingArea(xx, yy, 0, n)
    assert(a > 12.0 && a < 16.0)
  }

  test("rect clip: exact areas for known cases") {
    val square = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0)
    // fully inside clip window
    assert(RectClip.clippedArea(square, -1, -1, 11, 11) == 100.0)
    // half clipped
    assert(RectClip.clippedArea(square, 5, 0, 15, 10) == 50.0)
    // quarter
    assert(RectClip.clippedArea(square, 5, 5, 15, 15) == 25.0)
    // disjoint
    assert(RectClip.clippedArea(square, 20, 20, 30, 30) == 0.0)
    // triangle clipped by half-plane: area halves
    val tri = Array(0.0, 0.0, 4.0, 0.0, 0.0, 4.0, 0.0, 0.0)
    assert(math.abs(RectClip.clippedArea(tri, 0, 0, 2, 4) - 6.0) < 1e-12)
  }

  test("rect clip matches Monte-Carlo area on random blobs") {
    val rng = new graft.tables.SplitMix64(42)
    for (_ <- 0 until 10) {
      val ring = graft.tables.Synthetic.blobRing(
        30 + rng.nextDouble() * 40, 30 + rng.nextDouble() * 40, 25, 12, rng)
      val (x0, y0, x1, y1) = (25.0, 25.0, 75.0, 75.0)
      val exact = RectClip.clippedArea(ring, x0, y0, x1, y1)
      val n = ring.length / 2
      val xx = Array.tabulate(n)(i => ring(i * 2))
      val yy = Array.tabulate(n)(i => ring(i * 2 + 1))
      var hits = 0
      val samples = 40000
      for (_ <- 0 until samples) {
        val px = x0 + rng.nextDouble() * (x1 - x0)
        val py = y0 + rng.nextDouble() * (y1 - y0)
        if (Geom.pointInRing(px, py, xx, yy, 0, n) == Geom.IN) hits += 1
      }
      val mc = hits.toDouble / samples * (x1 - x0) * (y1 - y0)
      assert(math.abs(exact - mc) < 2500 * 0.02 + 10.0, s"exact=$exact mc=$mc")
    }
  }

  private def plen(p: Array[Double]): Double = {
    var len = 0.0
    var i = 0
    while (i + 3 < p.length) {
      len += math.hypot(p(i + 2) - p(i), p(i + 3) - p(i + 1)); i += 2
    }
    len
  }

  test("dashlines: gapless segmentation cuts exact dash lengths") {
    val parts = graft.operators.DashLines.dashParts(Array(0.0, 0.0, 10.0, 0.0), 2.0, 0.0)
    assert(parts.size == 5, parts.size.toString)
    parts.foreach(p => assert(math.abs(plen(p) - 2.0) < 1e-12))
    // pieces tile the line: consecutive endpoints meet
    (0 until 4).foreach { i =>
      assert(parts(i).takeRight(2).toSeq == parts(i + 1).take(2).toSeq)
    }
  }

  test("dashlines: gapped lines start with a half-gap; trailing dash kept") {
    val parts = graft.operators.DashLines.dashParts(Array(0.0, 0.0, 10.0, 0.0), 2.0, 1.0)
    // gaps [0,.5) [2.5,3.5) [5.5,6.5) [8.5,9.5); dashes between + 0.5 tail
    assert(parts.size == 4, parts.map(plen).toString)
    assert(parts.take(3).forall(p => math.abs(plen(p) - 2.0) < 1e-12))
    assert(math.abs(plen(parts(3)) - 0.5) < 1e-12)
    assert(parts.head.take(2).toSeq == Seq(0.5, 0.0))
  }

  test("dashlines: near-endpoint break snaps (no micro tail)") {
    val parts = graft.operators.DashLines.dashParts(Array(0.0, 0.0, 4.0001, 0.0), 2.0, 0.0)
    assert(parts.size == 2, parts.map(plen).toString)
    assert(parts(1).takeRight(2).toSeq == Seq(4.0001, 0.0))
  }

  test("dashlines: multi-segment path and DataFrame surface") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.0, 3.0, 4.0, 3.0, 9.0))).toDF("id", "line") // lengths 5+5
    val out = graft.operators.DashLines(df, "id", "line", dashLen = 3.0, gapLen = 0.0)
      .select("part", "piece_len").collect()
    assert(out.length == 4) // 3+3+3+1
    val lens = out.sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(lens.take(3).forall(l => math.abs(l - 3.0) < 1e-12))
    assert(math.abs(lens(3) - 1.0) < 1e-12)
  }
}
