package graft

import graft.operators.{Grids, Points, Proj}
import graft.tables.Synthetic

class GridsSpec extends SparkSuite {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("squareGrid covers the extent exactly; pointGrid centers inside") {
    val g = Grids.squareGrid(spark, 0, 0, 10.0, 5, 4)
    assert(g.count() == 20)
    val ext = g.agg(min("xmin"), min("ymin"), max("xmax"), max("ymax")).head()
    assert(ext.getDouble(0) == 0.0 && ext.getDouble(1) == 0.0)
    assert(ext.getDouble(2) == 50.0 && ext.getDouble(3) == 40.0)
    val pg = Grids.pointGrid(spark, 0, 0, 10.0, 5, 4)
    val pts = pg.select("x", "y").as[(Double, Double)].collect()
    assert(pts.forall { case (x, y) => x % 10.0 == 5.0 && y % 10.0 == 5.0 })
  }

  test("circleRectOverlap matches closed forms") {
    // circle fully inside rect
    val full = Grids.circleRectOverlap(5, 5, 1.0, 0, 0, 10, 10)
    assert(math.abs(full - math.Pi) < 1e-3)
    // rect fully inside circle
    val rect = Grids.circleRectOverlap(5, 5, 10.0, 4, 4, 6, 6)
    assert(math.abs(rect - 4.0) < 1e-9)
    // half circle (center on rect edge)
    val half = Grids.circleRectOverlap(0, 5, 2.0, 0, 0, 10, 10)
    assert(math.abs(half - math.Pi * 2.0) < 5e-3)
    // disjoint
    assert(Grids.circleRectOverlap(20, 20, 1.0, 0, 0, 10, 10) == 0.0)
  }

  test("pointToGrid: total weight ~= circle area / cell area per point") {
    val pts = Seq((1L, 12.0, 12.0)).toDF("id", "x", "y")
    val out = Grids.pointToGrid(spark, pts, "x", "y", 0, 0, cs = 5.0, radius = 3.0, minWeight = 0.0)
    val totalW = out.agg(sum("weight")).head().getDouble(0)
    assert(math.abs(totalW - math.Pi * 9.0 / 25.0) < 1e-2)
  }

  test("mercator round trip and tile keys") {
    val df = Seq((-122.4, 37.77), (0.0, 0.0), (139.7, 35.68)).toDF("lon", "lat")
    val rt = df.select(
      Proj.mercXToLon(Proj.lonToMercX(col("lon"))).as("lon2"),
      Proj.mercYToLat(Proj.latToMercY(col("lat"))).as("lat2"),
      col("lon"), col("lat")).collect()
    rt.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9)
    }
    val tiles = df.select(Proj.tileX(col("lon"), 2), Proj.tileY(col("lat"), 2)).collect()
    assert(tiles(1).getLong(0) == 2 && tiles(1).getLong(1) == 2) // (0,0) -> middle tile
  }

  test("anchor point is inside the shape, far from boundary (incl. holes)") {
    val layer = Synthetic.polygonLayer(6, seed = 3L, holeEvery = 3)
    for (s0 <- 0 until layer.numShapes) {
      val (ax, ay) = Points.anchor(layer, s0)
      assert(layer.findShapes(ax, ay).contains(s0), s"shape $s0: ($ax,$ay) not inside")
      val (cx, cy) = {
        // compare: anchor should beat a boundary-adjacent point's clearance
        val r0 = (0 until layer.numRings).find(layer.ringShape(_) == s0).get
        (layer.xx(layer.ringStart(r0)), layer.yy(layer.ringStart(r0)))
      }
      assert(graft.geom.Geom.distance(ax, ay, cx, cy) > 0)
    }
  }

  test("interpolate emits points at fixed spacing along the path") {
    val path = Array(0.0, 0.0, 10.0, 0.0)
    val pts = Points.interpolate(path, 2.5)
    assert(pts.toSeq == Seq(0.0, 0.0, 2.5, 0.0, 5.0, 0.0, 7.5, 0.0))
    val bent = Points.interpolate(Array(0.0, 0.0, 3.0, 4.0, 3.0, 9.0), 2.5) // lengths 5 + 5
    assert(bent.length / 2 == 4) // start + 3 interval marks before the end
  }

  private def ringArea(ring: Seq[Double]): Double = {
    val n = ring.length / 2
    val xs = Array.tabulate(n)(i => ring(i * 2))
    val ys = Array.tabulate(n)(i => ring(i * 2 + 1))
    graft.geom.Geom.signedRingArea(xs, ys, 0, n)
  }

  test("rhombus grid: 3 equal-area cells per hex, areas sum to the hexagon") {
    val size = 4.0
    val hexArea = 3.0 * math.sqrt(3.0) / 2.0 * size * size
    val cells = Grids.rhombusGrid(spark, 0, 0, 30, 20, size).collect()
    val byHex = cells.groupBy(r => (r.getLong(0), r.getLong(1)))
    byHex.foreach { case (qr, rows) =>
      assert(rows.length == 3, s"hex $qr has ${rows.length} rhombi")
      val areas = rows.map(r => ringArea(r.getSeq[Double](3)))
      areas.foreach(a => assert(math.abs(a - hexArea / 3.0) < 1e-9, s"area $a"))
    }
    // each rhombus ring is closed with 5 points
    cells.foreach(r => assert(r.getSeq[Double](3).length == 10))
  }

  test("dots evenness: spaced fill beats random fill on nearest-neighbor distance") {
    val square = Seq(Array(0.0, 0.0, 100.0, 0.0, 100.0, 100.0, 0.0, 100.0, 0.0, 0.0))
    val n = 200
    def minNN(flat: Array[Double]): Double = {
      var best = Double.MaxValue
      for (i <- 0 until flat.length / 2; j <- 0 until flat.length / 2 if i != j) {
        val d = graft.geom.Geom.distance(flat(i * 2), flat(i * 2 + 1), flat(j * 2), flat(j * 2 + 1))
        if (d < best) best = d
      }
      best
    }
    val even = Grids.dotFillEven(square, n, evenness = 1.0, seed = 5L)
    val random = Grids.dotFillEven(square, n, evenness = 0.0, seed = 5L)
    assert(even.length == n * 2 && random.length == n * 2)
    assert(minNN(even) > 3.0 * minNN(random),
      s"even=${minNN(even)} random=${minNN(random)}")
    // deterministic and inside the shape
    assert(even.sameElements(Grids.dotFillEven(square, n, 1.0, 5L)))
    (0 until n).foreach { i =>
      assert(even(i * 2) >= 0 && even(i * 2) <= 100 && even(i * 2 + 1) >= 0 && even(i * 2 + 1) <= 100)
    }
    // partial evenness sits between the two regimes
    val half = Grids.dotFillEven(square, n, evenness = 0.5, seed = 5L)
    assert(half.length == n * 2)
    assert(minNN(half) >= minNN(random))
  }

  test("graticule: reference lattice, polar extensions, exact endpoints") {
    import org.apache.spark.sql.functions._
    val g = Grids.graticule(spark, 10).collect()
    val mer = g.filter(_.getString(0) == "meridian")
    val par = g.filter(_.getString(0) == "parallel")
    // 36 meridian values (-170..180); multiples of 90 carry 2 polar parts
    assert(mer.map(_.getDouble(1)).distinct.length == 36)
    assert(mer.length == 36 + 2 * 4, s"${mer.length}") // -90, 0, 90, 180 extended
    assert(par.length == 19) // -90..90
    // parallels span the full world with exact endpoints
    par.foreach { r =>
      val p = r.getSeq[Double](3)
      assert(p.head == -180.0 && p(p.length - 2) == 180.0)
      assert(p(1) == r.getDouble(1) && p.last == r.getDouble(1))
    }
    // densification: 0.5-degree vertex spacing at interval 10
    val main = mer.find(r => r.getDouble(1) == 0.0 && r.getInt(2) == 0).get.getSeq[Double](3)
    assert(main.length / 2 == 321) // -80..80 at 0.5 degrees
    assert(main(1) == -80.0 && main.last == 80.0)
    // coarse graticule gets 1-degree precision and no polar parts
    val coarse = Grids.graticule(spark, 30).collect()
    assert(coarse.forall(_.getInt(2) == 0))
    val cMain = coarse.find(r => r.getString(0) == "meridian" && r.getDouble(1) == 0.0)
      .get.getSeq[Double](3)
    assert(cMain.length / 2 == 181) // -90..90 at 1 degree, y0 = 0
  }

  test("triangle grid: 6 equal-area cells per hex, areas sum to the hexagon") {
    val size = 4.0
    val hexArea = 3.0 * math.sqrt(3.0) / 2.0 * size * size
    val cells = Grids.triangleGrid(spark, 0, 0, 30, 20, size).collect()
    val byHex = cells.groupBy(r => (r.getLong(0), r.getLong(1)))
    byHex.foreach { case (qr, rows) =>
      assert(rows.length == 6, s"hex $qr has ${rows.length} triangles")
      val total = rows.map(r => ringArea(r.getSeq[Double](3))).sum
      assert(math.abs(total - hexArea) < 1e-9, s"sum $total vs $hexArea")
    }
  }
}
