package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

import graft.index.PolygonLayer

/**
 * KML / KMZ import — the reference's KML path
 * (`/root/reference/src/kml/kml-import.mjs`, via togeojson). DOM-based and
 * namespace-agnostic; extracts Placemark Points and Polygons. KMZ is a zip
 * whose first `.kml` entry is the document.
 */
object KmlIO {

  final case class KmlPoint(name: String, lon: Double, lat: Double)

  private def parseDoc(in: InputStream) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // defensive XML settings (untrusted input)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(in)
  }

  /** Unwrap a KMZ: bytes of the first .kml entry. */
  def kmlFromKmz(kmzBytes: Array[Byte]): Array[Byte] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(kmzBytes))
    var entry = zin.getNextEntry
    while (entry != null) {
      if (entry.getName.toLowerCase.endsWith(".kml")) {
        return zin.readAllBytes()
      }
      entry = zin.getNextEntry
    }
    throw new IllegalArgumentException("no .kml entry in KMZ")
  }

  private def elements(root: Element, tag: String): Seq[Element] = {
    val nl = root.getElementsByTagNameNS("*", tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def textOf(e: Element, tag: String): Option[String] =
    elements(e, tag).headOption.map(_.getTextContent.trim)

  /** Parse a `<coordinates>` blob: whitespace-separated lon,lat[,alt]. */
  def parseCoordinates(s: String): Array[Double] = {
    val out = Array.newBuilder[Double]
    s.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val parts = tok.split(",")
      if (parts.length >= 2) {
        out += parts(0).toDouble
        out += parts(1).toDouble
      }
    }
    out.result()
  }

  /** All Point placemarks as (name, lon, lat). */
  def readPoints(kmlBytes: Array[Byte]): Seq[KmlPoint] = {
    val doc = parseDoc(new ByteArrayInputStream(kmlBytes))
    elements(doc.getDocumentElement, "Placemark").flatMap { pm =>
      val name = textOf(pm, "name").getOrElse("")
      elements(pm, "Point").headOption.flatMap { p =>
        textOf(p, "coordinates").flatMap { c =>
          val xy = parseCoordinates(c)
          if (xy.length >= 2) Some(KmlPoint(name, xy(0), xy(1))) else None
        }
      }
    }
  }

  /** All Polygon placemarks as a PolygonLayer (outer + inner rings). */
  def readPolygons(kmlBytes: Array[Byte]): PolygonLayer = {
    val doc = parseDoc(new ByteArrayInputStream(kmlBytes))
    val shapes = elements(doc.getDocumentElement, "Placemark").zipWithIndex.flatMap {
      case (pm, idx) =>
        val polys = elements(pm, "Polygon")
        if (polys.isEmpty) None
        else {
          val rings = polys.flatMap { poly =>
            val outer = elements(poly, "outerBoundaryIs")
              .flatMap(b => elements(b, "coordinates")).map(_.getTextContent)
            val inner = elements(poly, "innerBoundaryIs")
              .flatMap(b => elements(b, "coordinates")).map(_.getTextContent)
            (outer ++ inner).map(parseCoordinates).filter(_.length >= 8)
          }
          if (rings.isEmpty) None else Some((idx.toLong, rings))
        }
    }
    PolygonLayer.fromShapes(shapes)
  }
}
