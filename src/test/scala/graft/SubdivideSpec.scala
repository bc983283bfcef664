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

  test("byExpression: count predicate yields balanced-halving leaf sizes") {
    val rng = new SplitMix64(7)
    val pts = (0 until 1000).map(i =>
      (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 100)).toDF("id", "x", "y")
    val sizes = Subdivide.byExpression(spark, pts, "x", "y", st => st.count > 120)
      .groupBy("leaf_id").count().select("count").as[Long].collect().sorted
    // balanced halving of 1000 with K=120: 1000 -> 500 -> 250 -> 125, 125 -> 63+62
    assert(sizes.sum == 1000)
    assert(sizes.forall(_ <= 120), sizes.toSeq.toString)
    assert(sizes.toSeq == computeHalving(1000, 120).sorted, sizes.toSeq.toString)
  }

  private def computeHalving(n: Long, k: Long): Seq[Long] =
    if (n > k && n > 1) computeHalving((n + 1) / 2, k) ++ computeHalving(n - (n + 1) / 2, k)
    else Seq(n)

  test("byExpression: width predicate splits down to narrow leaves") {
    val rng = new SplitMix64(23)
    val pts = (0 until 500).map(i =>
      (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 10)).toDF("id", "x", "y")
    val out = Subdivide.byExpression(spark, pts, "x", "y",
      st => st.width > 20.0 || st.height > 20.0)
    // every final leaf's point extent fits the expression bound
    val stats = out.groupBy("leaf_id")
      .agg(org.apache.spark.sql.functions.max("x"), org.apache.spark.sql.functions.min("x"))
      .collect()
    stats.foreach { r =>
      assert(r.getDouble(1) - r.getDouble(2) <= 20.0 + 1e-9,
        s"leaf ${r.getLong(0)} width ${r.getDouble(1) - r.getDouble(2)}")
    }
  }
}
