package graft

import graft.operators.Subdivide
import graft.tables.SplitMix64

class SubdivideSpec extends SparkSuite {

  import spark.implicits._

  test("byCount: every leaf within the cap, total preserved, bboxes partition") {
    val rng = new SplitMix64(19)
    // clustered distribution to force uneven splits
    val pts = (0 until 2000).map { i =>
      if (i % 3 == 0) (i.toLong, 20 + rng.nextDouble() * 5, 20 + rng.nextDouble() * 5)
      else (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 100)
    }.toDF("id", "x", "y")
    val (assigned, leaves) = Subdivide.byCount(spark, pts, "x", "y", maxPerLeaf = 100)
    assert(leaves.forall(_.count <= 100), leaves.filter(_.count > 100).toString)
    assert(leaves.map(_.count).sum == 2000)
    assert(assigned.select("leaf_id").distinct().count() == leaves.count(_.count > 0))
    // leaves tile the plane: disjoint interiors (pairwise bbox overlap has zero area)
    for (a <- leaves; b <- leaves if a.id < b.id) {
      val ox = math.min(a.xmax, b.xmax) - math.max(a.xmin, b.xmin)
      val oy = math.min(a.ymax, b.ymax) - math.max(a.ymin, b.ymin)
      assert(!(ox > 1e-12 && oy > 1e-12), s"leaves ${a.id} and ${b.id} overlap")
    }
  }
}
