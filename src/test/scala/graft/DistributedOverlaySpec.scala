package graft

import org.apache.spark.sql.functions._

import graft.operators.OverlayOp
import graft.tables.SplitMix64

class DistributedOverlaySpec extends SparkSuite {

  import spark.implicits._

  private def square(x: Double, y: Double, s: Double): Array[Double] =
    Array(x, y, x + s, y, x + s, y + s, x, y + s, x, y)

  test("dissolve2Distributed finds components and dissolves each independently") {
    // component A: chain of 3 overlapping squares; component B: 2 overlapping;
    // component C: isolated square
    val shapes = Seq(
      (1L, square(0, 0, 10)), (2L, square(8, 0, 10)), (3L, square(16, 0, 10)), // A
      (4L, square(50, 50, 10)), (5L, square(55, 50, 10)),                      // B
      (6L, square(80, 80, 5)))                                                 // C
      .toDF("id", "ring")
    val out = OverlayOp.dissolve2Distributed(spark, shapes, "id", "ring", cellRes = 5)
      .orderBy("component")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 3)
    val byComp = out.map(r => r._2 -> r).toMap
    // A: 3 shapes -> one ring, area = 26x10 chain = 3*100 - 2*(2*10)
    val a = out.find(_._2 == 3).get
    assert(a._3 == 1 && math.abs(a._4 - (300.0 - 2 * 20.0)) < 1e-9)
    // B: 2 shapes, area = 200 - 50
    val b = out.find(_._2 == 2).get
    assert(b._3 == 1 && math.abs(b._4 - 150.0) < 1e-9)
    // C: untouched
    val c = out.find(_._2 == 1).get
    assert(c._3 == 1 && math.abs(c._4 - 25.0) < 1e-9)
  }

  test("distributed result matches the single-kernel dissolve on random blobs") {
    val rng = new SplitMix64(23)
    val shapes = (0 until 40).map { i =>
      val cx = (i % 8) * 12.0 + 6 + rng.nextDouble() * 4
      val cy = (i / 8) * 12.0 + 6 + rng.nextDouble() * 4
      (i.toLong, graft.tables.Synthetic.blobRing(cx, cy, 7.0, 10, rng))
    }
    val df = shapes.toDF("id", "ring")
    val dist = OverlayOp.dissolve2Distributed(spark, df, "id", "ring", cellRes = 5)
      .agg(sum("area"), sum("n_shapes_in"), sum("n_rings_out")).head()
    val single = graft.geom.Overlay.dissolve2(shapes.map(s => Seq(s._2)))
    assert(dist.getLong(1) == 40)
    assert(math.abs(dist.getDouble(0) - graft.geom.Overlay.layerArea(single)) < 1e-6,
      s"dist=${dist.getDouble(0)} single=${graft.geom.Overlay.layerArea(single)}")
  }

  test("label propagation converges in O(log diameter) rounds (pointer jumping)") {
    // a 64-square chain has contact-graph diameter 63: plain min-label
    // propagation needs ~63 rounds; with path-halving maxIters=10 suffices
    // (the loop now REQUIREs convergence, so this would throw otherwise)
    val shapes = (0 until 64).map { i =>
      (i.toLong, square(i * 8.0, 0.0, 10.0)) // 2-unit overlaps chain them
    }.toDF("id", "ring")
    val out = OverlayOp.dissolve2Distributed(spark, shapes, "id", "ring",
        cellRes = 5, maxIters = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._2 == 64)
    // chain area: 64 squares of 100 minus 63 overlaps of 2x10
    assert(math.abs(out.head._4 - (64 * 100.0 - 63 * 20.0)) < 1e-6)
  }
}
