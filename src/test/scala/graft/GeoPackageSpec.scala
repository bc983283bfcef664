package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GeoPackage

/** Reads the reference's own .gpkg fixtures (test/data/geopackage/). */
class GeoPackageSpec extends AnyFunSuite {

  test("same_crs_points.gpkg: two point feature tables, expected rows") {
    val db = GeoPackage.open("/root/reference/test/data/geopackage/same_crs_points.gpkg")
    val tables = GeoPackage.featureTables(db)
    assert(tables.toSet == Set("oregon_cities", "washington_cities"))

    val or = GeoPackage.readFeatures(db, "oregon_cities")
    assert(or.features.length == 5)
    assert(or.geometryColumn == "geom" && or.srsId == 4326)
    val medford = or.features.head
    assert(medford.props("NAME") == "Medford")
    assert(medford.geomType == 1) // point
    val Seq(pt) = medford.parts
    // geometry matches the LAT/LNG attribute columns
    assert(math.abs(pt(0) - medford.props("LNG").asInstanceOf[Double]) < 1e-6)
    assert(math.abs(pt(1) - medford.props("LAT").asInstanceOf[Double]) < 1e-6)
    // quoted column names ("label-text") parsed
    assert(or.columns.contains("label-text"))
  }

  test("world_land_robin.gpkg: polygon features with multi-ring geometry") {
    val db = GeoPackage.open("/root/reference/test/data/geopackage/world_land_robin.gpkg")
    val tables = GeoPackage.featureTables(db)
    assert(tables == Seq("world_land_robin"))
    val lyr = GeoPackage.readFeatures(db, "world_land_robin")
    assert(lyr.features.nonEmpty)
    val totalRings = lyr.features.map(_.parts.length).sum
    assert(totalRings > lyr.features.length) // multipolygons present
    // all rings closed, coordinates in Robinson meters
    lyr.features.foreach(_.parts.foreach { r =>
      assert(r.length >= 8)
      assert(r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
      assert(math.abs(r(0)) < 2.0e7)
    })
  }

  test("data_only_tables.gpkg: feature tables plus extra attribute tables") {
    val db = GeoPackage.open("/root/reference/test/data/geopackage/data_only_tables.gpkg")
    assert(GeoPackage.featureTables(db).toSet ==
      Set("oregon_cities", "washington_cities"))
    // the attributes-only side tables read as plain tables
    val master = db.master.filter(_._1 == "table").map(_._2)
    val extra = master.filterNot(t => t.startsWith("gpkg_") || t.startsWith("rtree_") ||
      t.startsWith("sqlite_") || t.endsWith("_cities"))
    extra.foreach { t =>
      val (cols, rows) = db.readTable(t)
      assert(cols.nonEmpty && rows != null)
    }
  }
}
