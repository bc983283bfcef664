package graft

import graft.index.PolygonLayer
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSuite {

  import spark.implicits._

  // 2x2 grid of unit squares, keys 0..3 (col-major: 0 SW, 1 SE, 2 NW, 3 NE)
  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Array[Double] =
    Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1)
  private val layer = PolygonLayer.fromShapes(Seq(
    0L -> Seq(rect(0, 0, 1, 1)), 1L -> Seq(rect(1, 0, 2, 1)),
    2L -> Seq(rect(0, 1, 1, 2)), 3L -> Seq(rect(1, 1, 2, 2))))
  private def polys = Seq(0L, 1L, 2L, 3L).toDF("key")
  private def adj = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    .toDF("a", "b", "w")

  test("mode vote, distance tie-break, and fill of unvoted polygons") {
    val pts = Seq(
      (1L, 0.2, 0.2, "A"), (2L, 0.6, 0.6, "A"), (3L, 0.4, 0.8, "B"), // poly0: A 2-1
      (4L, 1.5, 0.5, "B"),                                           // poly1: B
      (5L, 1.5, 1.5, "A"), (6L, 1.05, 1.5, "B"))                     // poly3: tie
      .toDF("pid", "x", "y", "cat")
    val out = FuzzyJoin.join(spark, polys, "key", pts, "pid", "x", "y", "cat",
        layer, adj)
      .orderBy("key").as[(Long, String, Long)].collect().toSeq
    // poly3 tie resolves to A: its A-point is 0.5 from the boundary, the
    // B-point only 0.05 (reference resolveFuzzyJoinTie: max summed distance)
    // poly2 (no points) fills from neighbors 0 (A) and 3 (A)
    assert(out == Seq((0L, "A", 2L), (1L, "B", 1L), (2L, "A", 0L), (3L, "A", 1L)))
  }

  test("dedup_points collapses coincident duplicate votes") {
    val dup = (10 to 12).map(i => (i.toLong, 0.5, 0.5, "B")) // same (x,y,val) x3
    val pts = (Seq((1L, 0.2, 0.2, "A"), (2L, 0.6, 0.6, "A")) ++ dup)
      .toDF("pid", "x", "y", "cat")
    val without = FuzzyJoin.join(spark, polys, "key", pts, "pid", "x", "y", "cat",
        layer, adj)
      .filter($"key" === 0L).select("value").as[String].head()
    assert(without == "B") // 3 stacked B votes beat 2 A votes
    val withDedup = FuzzyJoin.join(spark, polys, "key", pts, "pid", "x", "y", "cat",
        layer, adj, dedupPoints = true)
      .filter($"key" === 0L).select("value").as[String].head()
    assert(withDedup == "A") // stacked votes collapse to one
  }

  test("no_dropouts restores a vanished category at its argmax-count polygon") {
    val pts = Seq(
      (1L, 0.5, 0.5, "A"),
      (2L, 1.2, 0.5, "B"), (3L, 1.8, 0.5, "B"), (4L, 1.5, 0.2, "C"), // poly1: B 2-1
      (5L, 1.5, 1.5, "B"))
      .toDF("pid", "x", "y", "cat")
    val plain = FuzzyJoin.join(spark, polys, "key", pts, "pid", "x", "y", "cat",
        layer, adj)
      .select("value").as[String].collect().toSet
    assert(!plain.contains("C")) // C dropped out
    val restored = FuzzyJoin.join(spark, polys, "key", pts, "pid", "x", "y", "cat",
        layer, adj, noDropouts = true)
      .orderBy("key").as[(Long, String, Long)].collect().toSeq
    assert(restored.map(_._2).contains("C"))
    assert(restored(1) == ((1L, "C", 2L))) // C restored where it scored count 1
  }
}
