package graft

import org.apache.spark.sql.functions._

/** A reference user's pipeline expressed through the [[Graft]] facade:
 * read → join → clip → dissolve → project → export. */
class GraftApiSpec extends SparkSuite {

  import spark.implicits._

  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Array[Double] =
    Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1)

  test("end-to-end pipeline through the command facade") {
    // -i (geojson twin of a shapefile)
    val ne = Graft.readShapefilePolygons(
      "/root/reference/test/data/ne/ne_110m_admin_0_scale_rank.shp")
    assert(ne.numShapes > 100)

    // -join attribute
    val t = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val s = Seq((1, 10.0)).toDF("key", "v")
    val joined = Graft.join(t, s, "id", "key").joined
    assert(joined.count() == 2)

    // point→polygon join + -clip layer + -dissolve2 through the facade
    val pts = Seq((1L, 2.0, 2.0), (2L, 50.0, 50.0)).toDF("id", "x", "y")
    val layer = graft.tables.Synthetic.oracleLayer
    val pipJoined = Graft.pointPolygonJoin(spark, pts, "x", "y", layer)
    assert(pipJoined.columns.contains("poly_key"))

    val targets = Seq((1L, rect(0, 0, 10, 10)), (2L, rect(20, 0, 30, 10))).toDF("key", "ring")
    val clips = Seq((9L, rect(5, -5, 25, 15))).toDF("key", "ring")
    val clipped = Graft.clipLayer(spark, targets, clips)
      .select("t_key", "area").as[(Long, Double)].collect().toMap
    assert(math.abs(clipped(1L) - 50.0) < 1e-9 && math.abs(clipped(2L) - 50.0) < 1e-9)

    val dissolved = Graft.dissolve2(Seq(Seq(rect(0, 0, 10, 10)), Seq(rect(5, 0, 15, 10))))
    assert(math.abs(graft.geom.Overlay.layerArea(dissolved) - 150.0) < 1e-9)

    // -proj + -o
    val projected = Graft.project(pts.withColumn("lon", $"x" - 100).withColumn("lat", $"y"),
      "lon", "lat", Graft.utm(13))
    assert(projected.select("xy").head().getSeq[Double](0).length == 2)

    val (shp, _) = Graft.writeShapefile(Seq(dissolved))
    assert(shp.length > 100)
    val svg = Graft.writeSvg(Seq((dissolved, """fill="none"""")))
    assert(svg.contains("<path"))
  }

  test("round-3 surface through the facade: proj strings, spherical simplify, grids, svg round-trip") {
    // -proj robinson via the string front-end + densified reprojection
    val robin = Graft.projection("robinson")
    val projected = Graft.projectPath(Array(-60.0, 20.0, 60.0, 70.0), robin, 10000.0)
    assert(projected.length >= 4)

    // -proj albersusa +PR routes Puerto Rico into its inset
    val usa = Graft.projection("albersusa +PR")
    assert(!usa.forward(-66.1, 18.4)._1.isInfinity)

    // spherical -simplify with keep-shapes over a lon/lat ring table
    val ringDf = Seq((1L, rect(10, 50, 11, 51).toSeq)).toDF("id", "ring")
    val simp = Graft.simplifySpherical(spark, ringDf, "ring", pct = 0.5)
    assert(simp.select("n_after").head().getLong(0) >= 4)

    // -grid type=rhombus + -subdivide expression + -graticule
    assert(Graft.rhombusGrid(spark, 0, 0, 20, 20, 4.0).count() > 0)
    val pts = (0 until 300).map(i => (i.toLong, (i % 17).toDouble, (i % 13).toDouble))
      .toDF("id", "x", "y")
    val sub = Graft.subdivide(spark, pts, "x", "y", st => st.count > 80)
    assert(sub.select("leaf_id").distinct().count() == 4) // 300 -> 150 -> 75x4
    assert(graft.operators.Grids.graticule(spark, 30).count() == 12 + 7)

    // -dots evenness through the facade
    val dots = Graft.dots(Seq(rect(0, 0, 50, 50)), 50, evenness = 1.0, seed = 2L)
    assert(dots.length == 100)

    // SVG export -> IMPORT round trip through the facade
    val svg = Graft.writeSvg(Seq((Seq(rect(0, 0, 10, 10)), """fill="red"""")))
    val feats = Graft.readSvg(svg)
    assert(feats.length == 1 && feats.head.attrs("fill") == "red")
  }
}
