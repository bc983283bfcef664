package graft

import org.apache.spark.sql.functions._

import graft.geom.Overlay
import graft.operators.{AlphaShape, Cluster, PolyJoin}
import graft.tables.SplitMix64

/**
 * The round-2 "no driver collect" contracts: distributed alpha shapes,
 * distributed polygon-overlap join, and the bounded-input cluster path must
 * reproduce their single-node kernels exactly.
 */
class DistributedKernelsSpec extends SparkSuite {

  import spark.implicits._

  test("distributed alpha complex equals the single-node kernel") {
    // jittered random points (general position: no cocircular quadruples)
    val rng = new SplitMix64(7)
    val pts = (0 until 400).map { i =>
      (i.toLong, rng.nextDouble() * 100.0, rng.nextDouble() * 60.0)
    }
    val xs = pts.map(_._2).toArray
    val ys = pts.map(_._3).toArray
    val alpha = 6.0

    val local = AlphaShape.rings(xs, ys, alpha)
    val dist = AlphaShape.distributedRings(spark, pts.toDF("id", "x", "y"), "x", "y", alpha)

    def sig(rs: Seq[Array[Double]]): Seq[(Int, Long)] = rs.map { r =>
      val n = r.length / 2
      val rx = Array.tabulate(n)(j => r(j * 2))
      val ry = Array.tabulate(n)(j => r(j * 2 + 1))
      (n, math.round(math.abs(graft.geom.Geom.signedRingArea(rx, ry, 0, n)) * 1e6))
    }.sorted
    assert(dist.nonEmpty)
    assert(sig(dist) == sig(local))
  }

  test("distributed alpha shape is invariant to input partitioning") {
    val rng = new SplitMix64(31)
    val pts = (0 until 300).map { i =>
      (i.toLong, rng.nextDouble() * 80.0, rng.nextDouble() * 80.0)
    }
    val a = AlphaShape.distributedRings(spark, pts.toDF("id", "x", "y").repartition(2), "x", "y", 5.0)
    val b = AlphaShape.distributedRings(spark, pts.toDF("id", "x", "y").repartition(13), "x", "y", 5.0)
    assert(a.map(_.toSeq) == b.map(_.toSeq) && a.nonEmpty)
  }

  test("overlapDistributed equals the driver mosaic kernel") {
    def square(x: Double, y: Double, s: Double): Array[Double] =
      Array(x, y, x + s, y, x + s, y + s, x, y + s, x, y)
    val rng = new SplitMix64(41)
    val targets = (0 until 40).map(i =>
      (i.toLong, square(rng.nextDouble() * 90, rng.nextDouble() * 90, 4 + rng.nextDouble() * 8)))
    val sources = (0 until 12).map(i =>
      (100L + i, square(rng.nextDouble() * 80, rng.nextDouble() * 80, 10 + rng.nextDouble() * 15)))

    val expected = PolyJoin.overlapAreas(
        targets.map { case (k, r) => (k, Seq(r): graft.geom.Overlay.Shape) },
        sources.map { case (k, r) => (k, Seq(r): graft.geom.Overlay.Shape) })
      .map { case (t, s, a) => (t, s, math.round(a * 1e6)) }.toSet

    val got = PolyJoin.overlapDistributed(spark,
        targets.toDF("key", "ring"), sources.toDF("key", "ring"))
      .as[(Long, Long, Double)].collect()
      .map { case (t, s, a) => (t, s, math.round(a * 1e6)) }.toSet
    assert(got == expected && got.nonEmpty)

    // largest-overlap: distributed max_by equals the driver kernel
    val expectedBest = PolyJoin.largestOverlap(
        targets.map { case (k, r) => (k, Seq(r): graft.geom.Overlay.Shape) },
        sources.map { case (k, r) => (k, Seq(r): graft.geom.Overlay.Shape) })
      .map { case (t, s, a) => (t, s, math.round(a * 1e6)) }.toSet
    val gotBest = PolyJoin.largestOverlapDf(PolyJoin.overlapDistributed(spark,
        targets.toDF("key", "ring"), sources.toDF("key", "ring")))
      .as[(Long, Long, Double)].collect()
      .map { case (t, s, a) => (t, s, math.round(a * 1e6)) }.toSet
    assert(gotBest == expectedBest)
  }

  test("clipLayerDistributed equals the driver kernel (clip AND erase)") {
    import graft.operators.OverlayOp
    val rng = new SplitMix64(61)
    def hexagon(cx: Double, cy: Double, r: Double): Array[Double] = {
      val out = new Array[Double](14)
      (0 until 6).foreach { i =>
        val a = math.Pi / 3 * i + 0.3
        out(i * 2) = cx + r * math.cos(a)
        out(i * 2 + 1) = cy + r * math.sin(a)
      }
      out(12) = out(0); out(13) = out(1)
      out
    }
    val targets = (0 until 30).map(i =>
      (i.toLong, hexagon(rng.nextDouble() * 80 + 10, rng.nextDouble() * 80 + 10,
        3 + rng.nextDouble() * 6)))
    val clips = (0 until 8).map(i =>
      (100L + i, hexagon(rng.nextDouble() * 80 + 10, rng.nextDouble() * 80 + 10,
        6 + rng.nextDouble() * 10)))
    val clipShapes: Seq[graft.geom.Overlay.Shape] = clips.map(c => Seq(c._2))

    for (erase <- Seq(false, true)) {
      val got = OverlayOp.clipLayerDistributed(spark,
          targets.toDF("key", "ring"), clips.toDF("key", "ring"), erase = erase)
        .select("t_key", "area").as[(Long, Double)].collect()
        .map { case (k, a) => k -> math.round(a * 1e6) }.toMap
      val want = targets.flatMap { case (k, ring) =>
        val out = if (erase) Overlay.erase(Seq(Seq(ring)), clipShapes)
                  else Overlay.clip(Seq(Seq(ring)), clipShapes)
        val a = Overlay.layerArea(out)
        if (out.isEmpty || a == 0.0) None else Some(k -> math.round(a * 1e6))
      }.toMap
      assert(got == want, s"erase=$erase")
      assert(got.nonEmpty)
    }
  }

  test("cluster assignPoints bounds driver input and clusters sanely") {
    val rng = new SplitMix64(5)
    // three well-separated blobs of 500 points each
    val pts = (0 until 1500).map { i =>
      val c = i % 3
      (i.toLong, c * 40.0 + rng.nextDouble() * 5, c * 40.0 + rng.nextDouble() * 5)
    }
    val out = Cluster.assignPoints(spark, pts.toDF("id", "x", "y"), "id", "x", "y",
        k = 3, maxInput = 64)
      .select("id", "cluster_id").as[(Long, Int)].collect().toMap
    assert(out.size == 1500 && out.values.toSet.size == 3)
    // blob purity: every blob maps to exactly one cluster
    (0 until 3).foreach { c =>
      val ids = (0 until 1500).filter(_ % 3 == c).map(_.toLong)
      assert(ids.map(out).toSet.size == 1, s"blob $c split")
    }
  }
}
