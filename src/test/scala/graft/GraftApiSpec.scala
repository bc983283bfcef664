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
}
