package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Overlay
import graft.operators.{Buffer, Cluster}

class BufferClusterSpec extends AnyFunSuite {

  test("point buffer ring has ~circle area") {
    val ring = Buffer.pointBufferRing(5, 5, 2.0, 64)
    val n = ring.length / 2
    val xs = Array.tabulate(n)(i => ring(i * 2))
    val ys = Array.tabulate(n)(i => ring(i * 2 + 1))
    val a = graft.geom.Geom.signedRingArea(xs, ys, 0, n)
    assert(math.abs(a - math.Pi * 4.0) < 0.05)
  }

  test("merged point buffers: two overlapping circles dissolve to one ring") {
    val a = Buffer.pointBufferRing(0, 0, 2.0)
    val b = Buffer.pointBufferRing(1, 0, 2.0)
    val merged = Overlay.dissolve2(Seq(Seq(a), Seq(b)))
    assert(merged.size == 1)
    val area = Overlay.layerArea(merged)
    // union of two r=2 circles at distance 1 (closed form: 2πr² - lens)
    val r = 2.0; val d = 1.0
    val lens = 2 * r * r * math.acos(d / (2 * r)) - d / 2 * math.sqrt(4 * r * r - d * d)
    val expected = 2 * math.Pi * r * r - lens
    assert(math.abs(area - expected) < 0.2, s"area=$area expected=$expected")
  }

  test("path buffer covers the path with ~capsule area") {
    val out = Buffer.pathBuffer(Array(0.0, 0.0, 10.0, 0.0), 1.0, nSeg = 64)
    val area = Overlay.layerArea(out)
    val expected = 20.0 + math.Pi // rect 10x2 + two half circles
    assert(math.abs(area - expected) < 0.1, s"area=$area expected=$expected")
  }

  test("polygonize: crossing lines yield bounded faces") {
    // a square drawn as 4 independent open lines plus a diagonal
    val lines = Seq(
      Array(0.0, 0.0, 10.0, 0.0), Array(10.0, 0.0, 10.0, 10.0),
      Array(10.0, 10.0, 0.0, 10.0), Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 10.0))
    val faces = Buffer.polygonize(lines)
    assert(faces.size == 2) // two triangles
    assert(math.abs(faces.map(Overlay.faceArea).sum - 100.0) < 1e-9)
  }

  test("divideLine splits a line at polygon boundary and tags pieces") {
    val square = Seq(Array(2.0, -1.0, 8.0, -1.0, 8.0, 11.0, 2.0, 11.0, 2.0, -1.0))
    val line = Array(0.0, 5.0, 10.0, 5.0)
    val pieces = Buffer.divideLine(line, square)
    assert(pieces.size == 3)
    val insideLen = pieces.filter(_._2).map(p => math.abs(p._1(2) - p._1(0))).sum
    val outsideLen = pieces.filterNot(_._2).map(p => math.abs(p._1(2) - p._1(0))).sum
    assert(insideLen == 6.0 && outsideLen == 4.0)
  }

  test("geodesic point buffer: constant great-circle distance from center") {
    val R = 6371008.8
    def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val d2r = math.Pi / 180
      val dlat = (lat2 - lat1) * d2r; val dlon = (lon2 - lon1) * d2r
      val a = math.sin(dlat / 2) * math.sin(dlat / 2) +
        math.cos(lat1 * d2r) * math.cos(lat2 * d2r) * math.sin(dlon / 2) * math.sin(dlon / 2)
      2 * R * math.asin(math.sqrt(a))
    }
    for ((lon, lat, r) <- Seq((-100.0, 40.0, 50000.0), (10.0, 70.0, 200000.0), (170.0, -35.0, 1000000.0))) {
      val ring = Buffer.geodesicPointBufferRing(lon, lat, r, nSeg = 36)
      (0 until 36).foreach { i =>
        val d = haversine(lon, lat, ring(i * 2), ring(i * 2 + 1))
        assert(math.abs(d - r) < 1e-3, s"vertex $i: $d vs $r")
      }
    }
  }

  test("geodesic path buffer covers the path and respects the radius envelope") {
    // a 2-segment path at mid latitude, 100 km radius
    val path = Array(10.0, 45.0, 11.0, 45.3, 12.0, 45.0)
    val r = 100000.0
    val rings = Buffer.geodesicPathBuffer(path, r, nSeg = 24)
    assert(rings.nonEmpty)
    def minDistToPath(lon: Double, lat: Double): Double =
      (0 until 3).map { i =>
        graft.geom.Geom.sphericalPathLength(
          Array(lon, path(i * 2)), Array(lat, path(i * 2 + 1)), 0, 2)
      }.min
    // every output vertex lies within [0.8r, 1.2r] of SOME path vertex zone:
    // boundary vertices sit near distance r from the nearest densified point
    rings.foreach { ring =>
      var i = 0
      while (i + 1 < ring.length) {
        val d = minDistToPath(ring(i), ring(i + 1))
        assert(d < 1.25 * r, s"vertex ${ring(i)},${ring(i + 1)} at $d m")
        i += 2
      }
    }
    // the path's vertices are inside the buffer (distance test via PIP)
    (0 until 3).foreach { i =>
      val inside = rings.exists(rr =>
        graft.geom.Overlay.evenOddContains(Seq(rr), path(i * 2), path(i * 2 + 1)))
      assert(inside, s"path vertex $i not covered")
    }
  }

  test("polygon buffer dilation/erosion areas match closed forms") {
    val sq: graft.geom.Overlay.Shape =
      Seq(Array(0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 0.0, 6.0, 0.0, 0.0))
    val r = 1.0
    val dil = graft.geom.Overlay.layerArea(Buffer.polygonBuffer(sq, r, nSeg = 32))
    val ngon = 16.0 * r * r * math.sin(math.Pi / 16.0)
    assert(math.abs(dil - (36.0 + 24.0 * r + ngon)) < 1e-9)
    val ero = graft.geom.Overlay.layerArea(Buffer.polygonBuffer(sq, -r, nSeg = 32))
    assert(math.abs(ero - 16.0) < 1e-9)
  }

  test("greedy cluster merges nearest centroids deterministically") {
    val items = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.5, 0.5), // tight group
      (4L, 100.0, 100.0), (5L, 101.0, 100.0),          // far group
      (6L, 50.0, 0.0))                                  // loner
    val asg = Cluster.greedy(items, k = 3)
    assert(asg.values.toSet.size == 3)
    assert(asg(1L) == asg(2L) && asg(2L) == asg(3L))
    assert(asg(4L) == asg(5L))
    assert(asg(6L) != asg(1L) && asg(6L) != asg(4L))
    // maxDist constraint stops early
    val asg2 = Cluster.greedy(items, k = 1, maxDist = 5.0)
    assert(asg2.values.toSet.size == 3)
  }

  test("group_by cluster never merges across groups; pct sets the target") {
    // two interleaved groups: nearest raw pair (1,10) straddles the groups
    // and must NOT merge
    val items = Seq(
      (1L, 0.0, 0.0, "g1"), (10L, 0.1, 0.0, "g2"),
      (2L, 1.0, 0.0, "g1"), (11L, 1.1, 0.0, "g2"),
      (3L, 50.0, 0.0, "g1"), (12L, 50.1, 0.0, "g2"))
    val asg = Cluster.greedyGrouped(items, k = 4)
    assert(asg.values.toSet.size == 4)
    val byCluster = asg.groupBy(_._2).values.map(_.keys.toSet).toSet
    // merges happened within groups only: {1,2} and {10,11}
    assert(byCluster.contains(Set(1L, 2L)) && byCluster.contains(Set(10L, 11L)))
    // floor: with k below the group count, stops at one cluster per group
    val asg2 = Cluster.greedyGrouped(items, k = 1)
    assert(asg2.values.toSet.size == 2)
    assert(asg2(1L) == asg2(2L) && asg2(2L) == asg2(3L))
    assert(asg2(10L) == asg2(11L) && asg2(11L) == asg2(12L))
    assert(asg2(1L) != asg2(10L))
    // pct -> Math.round(n * pct), floored at 1
    assert(Cluster.targetCount(6, 0.5) == 3)
    assert(Cluster.targetCount(5, 0.5) == 3) // JS Math.round half-up
    assert(Cluster.targetCount(3, 0.01) == 1)
  }
}
