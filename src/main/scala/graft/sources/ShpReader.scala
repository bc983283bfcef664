package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.index.PolygonLayer

/**
 * Minimal ESRI Shapefile (.shp) reader for polygon and polyline layers —
 * the format the reference reads natively
 * (`/root/reference/src/shapefile/shp-reader.mjs`, `shp-record.mjs`; type ids
 * per `shp-type.mjs:1-16`). Implemented from the public ESRI whitepaper
 * layout: 100-byte big-endian header, then records of
 * [recNum:int32be, contentLen:int32be(words)] + little-endian shape payload.
 *
 * Polygon layers load into the broadcastable [[PolygonLayer]]; shape keys are
 * 0-based record indexes (attribute joins attach the .dbf table separately).
 */
object ShpReader {

  /** The .prj sidecar of a .shp path, mapped to a catalog projection via
   * the WKT1 reader (None when no sidecar exists) — the reference resolves
   * shapefile CRS the same way (`shp-import` + wkt1ToProj). */
  def readPrj(shpPath: String): Option[graft.geom.Crs.Proj] = {
    val prj = java.nio.file.Paths.get(shpPath.replaceAll("(?i)\\.shp$", ".prj"))
    if (!java.nio.file.Files.exists(prj)) None
    else Some(graft.geom.Wkt.toProj(
      new String(java.nio.file.Files.readAllBytes(prj), "UTF-8")))
  }

  final val TypePoint = 1
  final val TypePolyline = 3
  final val TypePolygon = 5

  /** Read a polygon .shp into a PolygonLayer (non-polygon records skipped). */
  def readPolygons(path: String): PolygonLayer = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path)))
    buf.order(ByteOrder.BIG_ENDIAN)
    val magic = buf.getInt(0)
    require(magic == 9994, s"not a shapefile: magic=$magic")
    val fileWords = buf.getInt(24)
    val fileBytes = fileWords * 2

    val shapes = Seq.newBuilder[(Long, Seq[Array[Double]])]
    var pos = 100
    var rec = 0L
    while (pos + 8 <= fileBytes) {
      val contentWords = buf.getInt(pos + 4)
      val contentStart = pos + 8
      val shpType = {
        buf.order(ByteOrder.LITTLE_ENDIAN)
        buf.getInt(contentStart)
      }
      if (shpType == TypePolygon || shpType == TypePolyline) {
        // bbox: 4 doubles at +4; numParts at +36; numPoints at +40
        val numParts = buf.getInt(contentStart + 36)
        val numPoints = buf.getInt(contentStart + 40)
        val partsOff = contentStart + 44
        val pointsOff = partsOff + numParts * 4
        val parts = Array.tabulate(numParts)(i => buf.getInt(partsOff + i * 4))
        val rings = Seq.newBuilder[Array[Double]]
        var p = 0
        while (p < numParts) {
          val start = parts(p)
          val end = if (p + 1 < numParts) parts(p + 1) else numPoints
          val flat = new Array[Double]((end - start) * 2)
          var i = start
          while (i < end) {
            flat((i - start) * 2) = buf.getDouble(pointsOff + i * 16)
            flat((i - start) * 2 + 1) = buf.getDouble(pointsOff + i * 16 + 8)
            i += 1
          }
          rings += flat
          p += 1
        }
        if (shpType == TypePolygon) shapes += ((rec, rings.result()))
      }
      buf.order(ByteOrder.BIG_ENDIAN)
      pos = contentStart + contentWords * 2
      rec += 1
    }
    PolygonLayer.fromShapes(shapes.result())
  }

  /** Read polyline records as (recIdx, parts: flat coord arrays). */
  def readPolylines(path: String): Seq[(Long, Seq[Array[Double]])] = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path)))
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994)
    val fileBytes = buf.getInt(24) * 2
    val out = Seq.newBuilder[(Long, Seq[Array[Double]])]
    var pos = 100
    var rec = 0L
    while (pos + 8 <= fileBytes) {
      val contentWords = buf.getInt(pos + 4)
      val contentStart = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      if (buf.getInt(contentStart) == TypePolyline) {
        val numParts = buf.getInt(contentStart + 36)
        val numPoints = buf.getInt(contentStart + 40)
        val partsOff = contentStart + 44
        val pointsOff = partsOff + numParts * 4
        val parts = Array.tabulate(numParts)(i => buf.getInt(partsOff + i * 4))
        val paths = (0 until numParts).map { p =>
          val start = parts(p)
          val end = if (p + 1 < numParts) parts(p + 1) else numPoints
          val flat = new Array[Double]((end - start) * 2)
          var i = start
          while (i < end) {
            flat((i - start) * 2) = buf.getDouble(pointsOff + i * 16)
            flat((i - start) * 2 + 1) = buf.getDouble(pointsOff + i * 16 + 8)
            i += 1
          }
          flat
        }
        out += ((rec, paths))
      }
      buf.order(ByteOrder.BIG_ENDIAN)
      pos = contentStart + contentWords * 2
      rec += 1
    }
    out.result()
  }

  /** Read point records as (recIdx, x, y). */
  def readPoints(path: String): Seq[(Long, Double, Double)] = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path)))
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994)
    val fileBytes = buf.getInt(24) * 2
    val out = Seq.newBuilder[(Long, Double, Double)]
    var pos = 100
    var rec = 0L
    while (pos + 8 <= fileBytes) {
      val contentWords = buf.getInt(pos + 4)
      val contentStart = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      if (buf.getInt(contentStart) == TypePoint)
        out += ((rec, buf.getDouble(contentStart + 4), buf.getDouble(contentStart + 12)))
      buf.order(ByteOrder.BIG_ENDIAN)
      pos = contentStart + contentWords * 2
      rec += 1
    }
    out.result()
  }
}
