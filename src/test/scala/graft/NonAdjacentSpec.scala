package graft

import graft.operators.Classify
import org.apache.spark.sql.functions._

/** `-classify non-adjacent` (ref src/color/graph-color.mjs): the goldens
 * were produced by an independent line-faithful replica of the reference
 * algorithm (same stable sorts, bubble updates, balance counts) run over
 * R x C unit-square lattices with ascending-id neighbor order. */
class NonAdjacentSpec extends SparkSuite {

  private def lattice(r: Int, c: Int): IndexedSeq[Seq[Int]] =
    (0 until r * c).map { i =>
      val (ri, ci) = (i / c, i % c)
      Seq((ri - 1, ci), (ri, ci - 1), (ri, ci + 1), (ri + 1, ci))
        .collect { case (rr, cc) if rr >= 0 && rr < r && cc >= 0 && cc < c => rr * c + cc }
        .sorted
    }

  test("3x3 lattice, 4 colors: replica golden") {
    assert(Classify.nonAdjacentColors(lattice(3, 3), 4).toSeq ==
      Seq(2, 1, 0, 3, 0, 1, 2, 3, 0))
  }

  test("4x4 lattice, 4 colors: replica golden") {
    assert(Classify.nonAdjacentColors(lattice(4, 4), 4).toSeq ==
      Seq(3, 0, 3, 2, 1, 2, 1, 0, 2, 1, 0, 1, 3, 0, 3, 2))
  }

  test("3x4 lattice, 3 colors: replica golden") {
    assert(Classify.nonAdjacentColors(lattice(3, 4), 3).toSeq ==
      Seq(2, 0, 1, 2, 0, 1, 0, 1, 1, 0, 2, 0))
  }

  test("1x6 path, 3 colors: balance rotates the palette") {
    assert(Classify.nonAdjacentColors(lattice(1, 6), 3).toSeq ==
      Seq(2, 1, 0, 2, 0, 1))
  }

  test("2-coloring a bipartite lattice is the exact checkerboard") {
    // the forced-wavefront argument: a saturated node bubbles past every
    // unsaturated node, so each assignment after the first is parity-forced
    for ((r, c) <- Seq((3, 3), (5, 5), (4, 6))) {
      val got = Classify.nonAdjacentColors(lattice(r, c), 2)
      assert((0 until r * c).forall(i => got(i) == (i / c + i % c) % 2),
        s"${r}x$c not a checkerboard: ${got.toSeq}")
    }
  }

  test("no colors available falls back to the most-preferred color") {
    // triangle with 2 colors: third node has both colors adjacent
    val tri = IndexedSeq(Seq(1, 2), Seq(0, 2), Seq(0, 1))
    val got = Classify.nonAdjacentColors(tri, 2)
    assert(got.distinct.length == 2) // one conflict is unavoidable
  }

  test("sharedEdgeAdjacency + nonAdjacentDF end-to-end on a square lattice") {
    import spark.implicits._
    val (r, c) = (4, 4)
    // unit squares: shape id = ri*c + ci, 5 ring vertices (closed)
    val verts = (for {
      i <- 0 until r * c
      (dx, dy, s) <- Seq((0, 0, 0), (1, 0, 1), (1, 1, 2), (0, 1, 3), (0, 0, 4))
    } yield (i.toLong, 0, s, (i % c + dx).toDouble, (i / c + dy).toDouble))
      .toDF("id", "ring", "seq", "x", "y")
    val adj = Classify.sharedEdgeAdjacency(verts)
    // interior lattice adjacency: 2*r*c - r - c undirected pairs
    assert(adj.count() == 2 * r * c - r - c)
    val ids = verts.select("id").distinct()
    val colored = Classify.nonAdjacentDF(spark, ids, adj, 4)
      .orderBy("id").select("color_id").as[Long].collect().toSeq
    assert(colored == Seq(3L, 0, 3, 2, 1, 2, 1, 0, 2, 1, 0, 1, 3, 0, 3, 2))
    // and with 2 colors: the checkerboard
    val two = Classify.nonAdjacentDF(spark, ids, adj, 2)
      .orderBy("id").select("color_id").as[Long].collect().toSeq
    assert(two == (0 until r * c).map(i => ((i / c + i % c) % 2).toLong))
  }
}
