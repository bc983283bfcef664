package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.index.PolygonLayer

/**
 * GeoJSON polygon-layer reader/writer — the engine's counterpart of the
 * reference's GeoJSON import/export
 * (`/root/reference/src/geojson/geojson-import.mjs:9-36`, `geojson-export.mjs`).
 *
 * Polygon layers are the broadcast side of every spatial join (≪ the image
 * table), so a driver-side parse is the right scale point; row-scale data
 * lives in Parquet. Accepts FeatureCollection / Feature / bare geometry with
 * Polygon or MultiPolygon geometries; other types are skipped. Feature keys
 * come from a numeric `id` property when present, else the feature index.
 */
object GeoJsonIO {

  private val mapper = new ObjectMapper()

  def fromGeoJson(json: String): PolygonLayer = {
    val root = mapper.readTree(json)
    val features: Seq[JsonNode] = root.path("type").asText() match {
      case "FeatureCollection" =>
        val it = root.path("features").elements()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
      case "GeometryCollection" =>
        val it = root.path("geometries").elements()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
      case "Feature" => Seq(root)
      case _         => Seq(root) // bare geometry
    }
    val shapes = features.zipWithIndex.flatMap { case (f, idx) =>
      val geom = if (f.has("geometry")) f.path("geometry") else f
      val key =
        if (f.path("properties").path("id").isNumber) f.path("properties").path("id").asLong()
        else if (f.path("id").isNumber) f.path("id").asLong()
        else idx.toLong
      geom.path("type").asText() match {
        case "Polygon" =>
          Some((key, ringsOf(geom.path("coordinates"))))
        case "MultiPolygon" =>
          val it = geom.path("coordinates").elements()
          val all = Iterator.continually(it).takeWhile(_.hasNext)
            .map(_.next()).flatMap(p => ringsOf(p)).toSeq
          Some((key, all))
        case _ => None
      }
    }
    PolygonLayer.fromShapes(shapes)
  }

  private def ringsOf(coords: JsonNode): Seq[Array[Double]] = {
    val rings = Seq.newBuilder[Array[Double]]
    val it = coords.elements()
    while (it.hasNext) {
      val ring = it.next()
      val flat = Array.newBuilder[Double]
      val pit = ring.elements()
      while (pit.hasNext) {
        val p = pit.next()
        flat += p.get(0).asDouble()
        flat += p.get(1).asDouble()
      }
      rings += flat.result()
    }
    rings.result()
  }

  /** Export a layer as a GeoJSON FeatureCollection (one Polygon per shape,
   * first ring outer, rest holes — matching how fromShapes grouped them). */
  def toGeoJson(layer: PolygonLayer): String = {
    val sb = new StringBuilder
    sb.append("""{"type":"FeatureCollection","features":[""")
    var first = true
    var s = 0
    while (s < layer.numShapes) {
      if (!first) sb.append(',')
      first = false
      sb.append(s"""{"type":"Feature","properties":{"id":${layer.shapeKeys(s)}},"geometry":{"type":"Polygon","coordinates":[""")
      var firstRing = true
      var r = 0
      while (r < layer.numRings) {
        if (layer.ringShape(r) == s) {
          if (!firstRing) sb.append(',')
          firstRing = false
          sb.append('[')
          var i = layer.ringStart(r)
          while (i < layer.ringStart(r + 1)) {
            if (i > layer.ringStart(r)) sb.append(',')
            sb.append('[').append(layer.xx(i)).append(',').append(layer.yy(i)).append(']')
            i += 1
          }
          sb.append(']')
        }
        r += 1
      }
      sb.append("]}}")
      s += 1
    }
    sb.append("]}")
    sb.toString
  }
}
