package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Crs, Wkt}

/** .prj (WKT1/WKT2) reader + writer against ALL of the reference's
 * shapefile sidecars. Fixture-backed cases skip cleanly (assume) when the
 * reference tree is absent. */
class WktSpec extends AnyFunSuite {

  private val refRoot = Paths.get("/root/reference/test")

  private def allPrjFiles: Seq[Path] = {
    if (!Files.exists(refRoot)) return Nil
    Files.walk(refRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".prj") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
  }

  test("every reference .prj parses; all but the 'Unknown Projection' map to the catalog") {
    assume(Files.exists(refRoot), "reference fixtures not present")
    val files = allPrjFiles
    assert(files.length >= 20, s"expected the reference fixture set, found ${files.length}")
    var mapped = 0
    var rejected = 0
    files.foreach { f =>
      val wkt = new String(Files.readAllBytes(f), "UTF-8")
      val tree = Wkt.parse(wkt) // structural parse must always succeed
      assert(tree.kind == "GEOGCS" || tree.kind == "PROJCS", s"$f root ${tree.kind}")
      try {
        val p = Wkt.toProj(wkt)
        val (x, y) = p.forward(114.1, 30.5)
        assert(x.isFinite && y.isFinite, s"$f projected to ($x, $y)")
        mapped += 1
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.toLowerCase.contains("unknown projection"), s"$f rejected: ${e.getMessage}")
          rejected += 1
      }
    }
    assert(rejected <= 1, s"$rejected fixtures rejected")
    assert(mapped >= files.length - 1)
  }

  test("gauss_kruger .prj maps to Tmerc with the file's parameters; readPrj resolves the sidecar") {
    assume(Files.exists(refRoot), "reference fixtures not present")
    val prjPath = "/root/reference/test/data/issues/193/gauss_kruger.prj"
    val wkt = new String(Files.readAllBytes(Paths.get(prjPath)), "UTF-8")
    Wkt.toProj(wkt) match {
      case t: Crs.Tmerc =>
        assert(t.lon0Deg == 114.0 && t.lat0Deg == 0.0 && t.k0 == 1.0)
        assert(t.falseE == 500000.0 && t.falseN == 0.0)
      case other => fail(s"expected Tmerc, got $other")
    }
    // the shapefile-read integration: .shp path (any case) -> sidecar proj
    val viaShp = graft.sources.ShpReader.readPrj(prjPath.replaceAll("\\.prj$", ".shp"))
    assert(viaShp.exists(_.isInstanceOf[Crs.Tmerc]))
    val viaUpper = graft.sources.ShpReader.readPrj(prjPath.replaceAll("\\.prj$", ".SHP"))
    assert(viaUpper.exists(_.isInstanceOf[Crs.Tmerc]), "extension match must be case-insensitive")
    assert(graft.sources.ShpReader.readPrj("/nonexistent/dir/x.shp").isEmpty)
  }

  test("GEOGCS-only .prj maps to longlat; a UTF-8 BOM is tolerated") {
    assume(Files.exists(refRoot), "reference fixtures not present")
    val wkt = new String(Files.readAllBytes(Paths.get(
      "/root/reference/test/data/ne/ne_110m_admin_0_pacific_groupings.prj")), "UTF-8")
    assert(Wkt.toProj(wkt) == Crs.Longlat)
    assert(Wkt.toProj("\uFEFF" + wkt) == Crs.Longlat)
  }

  test("ESRI *_Of_Center parameter names are honored; nonzero false offsets reject loudly") {
    val ortho = """PROJCS["World_Orthographic",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Orthographic"],PARAMETER["Longitude_Of_Center",30.0],PARAMETER["Latitude_Of_Center",45.0],UNIT["Meter",1.0]]"""
    Wkt.toProj(ortho) match {
      case o: Crs.Orthographic => assert(o.lat0Deg == 45.0 && o.lon0Deg == 30.0)
      case other => fail(s"expected Orthographic, got $other")
    }
    val shifted = """PROJCS["X",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Albers"],PARAMETER["False_Easting",2000000.0],PARAMETER["Central_Meridian",-96.0],UNIT["Meter",1.0]]"""
    val e = intercept[IllegalArgumentException](Wkt.toProj(shifted))
    assert(e.getMessage.contains("False_Easting"))
  }

  test(".prj writer round-trips through the reader for every expressible projection") {
    val cases: Seq[Crs.Proj] = Seq(
      Crs.Longlat,
      Crs.Tmerc(0.0, 114.0, 1.0, 500000.0, 0.0),
      Crs.Lcc(33.0, 45.0, 39.0, -96.0),
      Crs.Albers(29.5, 45.5, 23.0, -96.0),
      Crs.Mercator(12.0),
      Crs.Robinson(10.0),
      Crs.Sinusoidal(-30.0),
      Crs.Mollweide(5.0),
      Crs.WinkelTripel(0.0),
      Crs.Laea(45.0, 8.0),
      Crs.Orthographic(40.0, -100.0),
      Crs.Stereographic(60.0, -45.0),
      Crs.Equirectangular(30.0, 15.0))
    cases.foreach { p =>
      val wkt = Wkt.fromProj(p)
      val back = Wkt.toProj(wkt)
      // parameter-level round trip (radius defaults normalize to equal values)
      assert(back == p, s"round trip for $p gave $back")
    }
    // forward-only polyhedral projections have no WKT1 method
    intercept[IllegalArgumentException](Wkt.fromProj(Crs.DymaxionProj()))
  }

  test("WKT2 from a FlatGeobuf header maps through the same reader") {
    val fgb = "/root/reference/test/data/features/buffer/greenland_merc_polygon_error3.fgb"
    assume(Files.exists(Paths.get(fgb)), "reference fixtures not present")
    val layer = graft.sources.FlatGeobuf.read(fgb)
    assert(layer.crsWkt.isDefined, "fixture header should carry a WKT2 CRS")
    val wkt = layer.crsWkt.get
    assert(wkt.startsWith("PROJCRS"))
    Wkt.toProj(wkt) match {
      case m: Crs.Mercator => assert(m.lon0Deg == 0.0)
      case other => fail(s"expected Mercator, got $other")
    }
    // WKT2 bare keywords (CS[Cartesian,2], AXIS[...,east,ORDER[1]]) parse
    val tree = Wkt.parse(wkt)
    assert(tree.find("CS").isDefined && tree.find("METHOD").isDefined)
  }
}
