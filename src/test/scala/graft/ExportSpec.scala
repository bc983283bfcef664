package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DbfReader, Export, GeoParquet, ShpReader, SvgIO}

class ExportSpec extends SparkSuite {

  import spark.implicits._

  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Array[Double] =
    Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1)

  test("shapefile polygon export round-trips through our own reader") {
    val shapes = Seq(
      Seq(rect(0, 0, 10, 10), rect(3, 3, 5, 5)), // with hole ring
      Seq(rect(20, 20, 25, 30)))
    val (shp, shx) = Export.writePolygonShp(shapes)
    assert(shx.length == 100 + shapes.length * 8)
    val dir = Files.createTempDirectory("shpexp")
    Files.write(dir.resolve("t.shp"), shp)
    val layer = ShpReader.readPolygons(dir.resolve("t.shp").toString)
    assert(layer.numRings == 3)
    // ring coordinates survive byte-exactly
    val r0 = (0 until 5).flatMap(i => Seq(layer.xx(i), layer.yy(i))).toArray
    assert(r0.sameElements(shapes.head.head))
  }

  test("shapefile polyline export round-trips") {
    val lines = Seq(
      Seq(Array(0.0, 0.0, 5.0, 3.0, 9.5, -1.25)),
      Seq(Array(10.0, 10.0, 12.0, 14.0), Array(20.0, 20.0, 21.0, 22.0, 23.0, 19.0)))
    val (shp, _) = Export.writePolylineShp(lines)
    val dir = Files.createTempDirectory("shpline")
    Files.write(dir.resolve("l.shp"), shp)
    val back = ShpReader.readPolylines(dir.resolve("l.shp").toString)
    assert(back.length == 2)
    assert(back(0)._2.head.sameElements(lines(0).head))
    assert(back(1)._2.length == 2 && back(1)._2(1).sameElements(lines(1)(1)))
  }

  test("shapefile point export round-trips") {
    val pts = Seq((1.5, 2.5), (-3.25, 4.0), (100.0, -45.5))
    val (shp, _) = Export.writePointShp(pts)
    val dir = Files.createTempDirectory("shppt")
    Files.write(dir.resolve("p.shp"), shp)
    val back = ShpReader.readPoints(dir.resolve("p.shp").toString)
    assert(back.map(p => (p._2, p._3)) == pts)
  }

  test("dbf export round-trips through our own reader") {
    val fields = Seq(("NAME", 'C', 12, 0), ("POP", 'N', 10, 0), ("RATE", 'N', 12, 3))
    val rows = Seq(
      Seq("alpha", 1234L, 0.25),
      Seq("beta-longer", 987654321L, 12.5),
      Seq("", null, null))
    val bytes = Export.writeDbf(fields, rows)
    val dir = Files.createTempDirectory("dbfexp")
    Files.write(dir.resolve("t.dbf"), bytes)
    val table = DbfReader.read(dir.resolve("t.dbf").toString)
    assert(table.fields.map(_.name) == Seq("NAME", "POP", "RATE"))
    assert(table.rows.length == 3)
    assert(table.rows(0)("NAME") == "alpha" && table.rows(0)("POP") == 1234.0)
    assert(table.rows(1)("RATE") == 12.5)
    assert(table.rows(2)("POP") == null)
  }

  test("svg export contains a path per shape with flipped y") {
    val svg = Export.writeSvg(Seq(
      (Seq(rect(0, 0, 10, 10)), """fill="red""""),
      (Seq(rect(2, 2, 4, 4)), """fill="blue"""")))
    assert(svg.contains("<svg") && svg.count(_ == 'M') == 2)
    assert(svg.contains("viewBox=\"0 0 10.00 10.00\""))
    // y flip: the outer rect's (0,0) renders at svg y = 10
    assert(svg.contains("M0.00 10.00"))
  }

  test("svg IMPORT round-trips writeSvg output back to data space") {
    val outer = rect(0, 0, 10, 10)
    val inner = rect(2, 2, 4, 4)
    val svg = Export.writeSvg(Seq(
      (Seq(outer), """fill="red""""),
      (Seq(inner), """fill="blue"""")), precision = 4)
    val feats = SvgIO.read(svg)
    assert(feats.length == 2 && feats.forall(_.kind == "path"))
    assert(feats.head.attrs("fill") == "red" && feats(1).attrs("fill") == "blue")
    // map back: viewBox origin (0,0), ymax = 10
    val back = feats.map(f => SvgIO.svgToData(f.parts, 0.0, 10.0))
    def close(a: Array[Double], b: Array[Double]): Boolean =
      a.length == b.length && a.zip(b).forall { case (u, v) => math.abs(u - v) < 1e-3 }
    assert(close(back.head.head, outer), back.head.head.toSeq.toString)
    assert(close(back(1).head, inner))
  }

  test("svg import accepts single-quoted attributes") {
    val feats = SvgIO.read("""<svg><rect x='1' y='2' width='3' height='4'/>
      |<line x1="0" y1='0' x2='5' y2="5"/></svg>""".stripMargin)
    assert(feats.length == 2)
    val r = feats.head.parts.head
    assert(r.toSeq.take(4) == Seq(1.0, 2.0, 4.0, 2.0)) // x, y, x+w, y
    assert(feats(1).parts.head.toSeq == Seq(0.0, 0.0, 5.0, 5.0))
  }

  test("svg import: relative commands, H/V, curves, shape elements") {
    // relative path: m 1 1 l 2 0 0 2 z -> triangle-ish closed subpath
    val p = SvgIO.parsePathData("m 1 1 l 2 0 0 2 z")
    assert(p.length == 1)
    assert(p.head.toSeq == Seq(1.0, 1.0, 3.0, 1.0, 3.0, 3.0, 1.0, 1.0))
    // H/V absolute
    val hv = SvgIO.parsePathData("M0 0 H5 V5 H0 Z")
    assert(hv.head.toSeq == Seq(0.0, 0.0, 5.0, 0.0, 5.0, 5.0, 0.0, 5.0, 0.0, 0.0))
    // cubic flattening: endpoint exact, fixed step count
    val c = SvgIO.parsePathData("M0 0 C 0 10 10 10 10 0")
    assert(c.head.length == 2 + SvgIO.CurveSteps * 2)
    assert(c.head(c.head.length - 2) == 10.0 && c.head.last == 0.0)
    // two subpaths
    val two = SvgIO.parsePathData("M0 0 L1 0 1 1 Z M5 5 L6 5")
    assert(two.length == 2 && two(1).toSeq == Seq(5.0, 5.0, 6.0, 5.0))
    // shape elements
    val doc = """<svg><rect x="1" y="2" width="3" height="4" fill="red"/>
      |<circle cx="0" cy="0" r="2"/>
      |<polygon points="0,0 4,0 4,4"/>
      |<polyline points="0 0 1 1 2 0"/>
      |<line x1="0" y1="0" x2="9" y2="9"/></svg>""".stripMargin
    val fs = SvgIO.read(doc)
    assert(fs.map(_.kind) == Seq("rect", "circle", "polygon", "polyline", "line"))
    assert(fs.head.parts.head.toSeq == Seq(1.0, 2.0, 4.0, 2.0, 4.0, 6.0, 1.0, 6.0, 1.0, 2.0))
    assert(fs(1).parts.head.length == 66) // 32-gon closed
    assert(fs(2).parts.head.takeRight(2).toSeq == Seq(0.0, 0.0)) // auto-closed
    assert(fs(3).parts.head.length == 6)
    // unsupported arc command throws with the letter
    val err = intercept[IllegalArgumentException](SvgIO.parsePathData("M0 0 A 5 5 0 0 1 10 10"))
    assert(err.getMessage.contains("'A'"))
  }

  test("zip and gzip containers round-trip (shp+dbf bundle)") {
    val (shp, shx) = Export.writePointShp(Seq((1.0, 2.0)))
    val dbf = Export.writeDbf(Seq(("ID", 'N', 4, 0)), Seq(Seq(7L)))
    val bundle = Export.zip(Seq(("layer.shp", shp), ("layer.shx", shx), ("layer.dbf", dbf)))
    val back = Export.unzip(bundle).toMap
    assert(back.keySet == Set("layer.shp", "layer.shx", "layer.dbf"))
    assert(back("layer.shp").sameElements(shp))
    val gz = Export.gzip(shp)
    assert(Export.gunzip(gz).sameElements(shp))
  }

  test("GeoParquet: WKB column + geo footer metadata, Spark reads data back") {
    val df = Seq((1L, 10.0, 20.0), (2L, -5.5, 7.25)).toDF("id", "x", "y")
      .withColumn("geometry", GeoParquet.wkbPoint(col("x"), col("y")))
    val dir = Files.createTempDirectory("geopq").toString + "/pts"
    GeoParquet.write(spark, df, "geometry", dir, Seq("Point"), (-5.5, 7.25, 10.0, 20.0))
    val meta = GeoParquet.readGeoMetadata(dir)
    assert(meta != null && meta.contains("\"primary_column\":\"geometry\"")
      && meta.contains("\"encoding\":\"WKB\"") && meta.contains("1.0.0"))
    // Spark still reads the rewritten files, and the WKB decodes
    val back = spark.read.parquet(dir).orderBy("id").collect()
    assert(back.length == 2)
    val (x, y) = GeoParquet.parseWkbPoint(back(0).getAs[Array[Byte]]("geometry"))
    assert(x == 10.0 && y == 20.0)
  }

  test("bbox-index sidecar: reference-shaped keys, layer order, bounds") {
    // ref src/io/mapshaper-export.mjs:207-223: [{bbox:[...], name}, ...]
    val square = Seq(Array(0.0, 0.0, 2.0, 0.0, 2.0, 3.0, 0.0, 3.0, 0.0, 0.0))
    val tri = Seq(Array(-1.5, -2.0, 4.0, -2.0, 1.0, 5.25, -1.5, -2.0))
    val json = Export.bboxIndexJson(Seq(
      ("layer1", Seq(square)), ("lay\"er2", Seq(tri))))
    assert(json ==
      """[{"bbox":[0,0,2,3],"name":"layer1"},""" +
        """{"bbox":[-1.5,-2,4,5.25],"name":"lay\"er2"}]""")
    // integral bounds print bare (JSON.stringify parity), fractions survive
    assert(!json.contains("2.0,"))
  }

  test("jsNumber matches JS Number::toString across the notation switch") {
    val cases = Seq(
      20037508.34 -> "20037508.34", // Java says 2.003750834E7
      1e21 -> "1e+21", 1.5e22 -> "1.5e+22",
      2.5e-7 -> "2.5e-7", 1e-6 -> "0.000001", 0.001234 -> "0.001234",
      1e15 -> "1000000000000000", 123.0 -> "123", 5.25 -> "5.25",
      -1.5 -> "-1.5", 0.0 -> "0", -0.0 -> "0", 0.1 -> "0.1",
      Double.NaN -> "null", Double.PositiveInfinity -> "null")
    cases.foreach { case (v, want) =>
      assert(Export.jsNumber(v) == want, s"jsNumber($v)")
    }
  }
}
