package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * FlatGeobuf (.fgb) reader — the format the reference imports via the
 * flatgeobuf npm library (`/root/reference/src/flatgeobuf/mapshaper-flatgeobuf.mjs`).
 * Implemented from the PUBLIC specs only: the FlatGeobuf layout
 * (flatgeobuf.org: magic, size-prefixed header, packed Hilbert R-tree,
 * size-prefixed features) and the FlatBuffers binary format
 * (google.github.io/flatbuffers: root offset → vtable → fields).
 *
 * Supports Point / LineString / Polygon / MultiPolygon geometries (2D) and
 * Bool/Int/Long/Double/String properties — the slice mapshaper's own
 * importer maps to its dataset model.
 */
object FlatGeobuf {

  final case class Column(name: String, colType: Int)

  final case class Feature(
      geometryType: Int,
      parts: Seq[Array[Double]],       // rings / paths / single point, flat xy
      props: Map[String, Any])

  final case class Layer(
      geometryType: Int,
      envelope: Array[Double],
      columns: Seq[Column],
      features: Seq[Feature])

  // GeometryType enum (spec)
  final val GPoint = 1
  final val GLineString = 2
  final val GPolygon = 3
  final val GMultiPolygon = 6

  /** Minimal FlatBuffers table accessor. */
  private final class FB(val buf: ByteBuffer) {
    def root(start: Int): Int = start + buf.getInt(start)
    /** absolute position of field `id` in `table`, or 0 if absent */
    def field(table: Int, id: Int): Int = {
      val vtable = table - buf.getInt(table)
      val vtSize = buf.getShort(vtable) & 0xffff
      val slot = 4 + id * 2
      if (slot + 1 >= vtSize) 0
      else {
        val off = buf.getShort(vtable + slot) & 0xffff
        if (off == 0) 0 else table + off
      }
    }
    def indirect(pos: Int): Int = pos + buf.getInt(pos)
    def vecLen(pos: Int): Int = buf.getInt(indirect(pos))
    def vecData(pos: Int): Int = indirect(pos) + 4
    def string(pos: Int): String = {
      val v = indirect(pos)
      val len = buf.getInt(v)
      val b = new Array[Byte](len)
      var i = 0
      while (i < len) { b(i) = buf.get(v + 4 + i); i += 1 }
      new String(b, StandardCharsets.UTF_8)
    }
  }

  def read(path: String): Layer = readBytes(Files.readAllBytes(Paths.get(path)))

  def readBytes(bytes: Array[Byte]): Layer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      bytes(0) == 'f' && bytes(1) == 'g' && bytes(2) == 'b' &&
      bytes(4) == 'f' && bytes(5) == 'g' && bytes(6) == 'b',
      "not a FlatGeobuf file")
    val headerLen = buf.getInt(8)
    val fb = new FB(buf)
    val hdr = fb.root(12)

    val envelope = {
      val f = fb.field(hdr, 1)
      if (f == 0) Array.emptyDoubleArray
      else {
        val n = fb.vecLen(f); val d = fb.vecData(f)
        Array.tabulate(n)(i => buf.getDouble(d + i * 8))
      }
    }
    val geometryType = {
      val f = fb.field(hdr, 2)
      if (f == 0) 0 else buf.get(f) & 0xff
    }
    val columns: Seq[Column] = {
      val f = fb.field(hdr, 7)
      if (f == 0) Seq.empty
      else {
        val n = fb.vecLen(f); val d = fb.vecData(f)
        (0 until n).map { i =>
          val t = fb.indirect(d + i * 4)
          val nameF = fb.field(t, 0)
          val typeF = fb.field(t, 1)
          Column(if (nameF == 0) "" else fb.string(nameF),
            if (typeF == 0) 0 else buf.get(typeF) & 0xff)
        }
      }
    }
    val featuresCount = {
      val f = fb.field(hdr, 8)
      if (f == 0) 0L else buf.getLong(f)
    }
    val indexNodeSize = {
      val f = fb.field(hdr, 9)
      if (f == 0) 16 else buf.getShort(f) & 0xffff
    }

    // skip the packed Hilbert R-tree: level sizes bottom-up, 40 bytes/node
    var pos = 12 + headerLen
    if (indexNodeSize > 0 && featuresCount > 0) {
      var n = featuresCount
      var total = n
      while (n != 1) {
        n = (n + indexNodeSize - 1) / indexNodeSize
        total += n
      }
      pos += (total * 40).toInt
    }

    val features = Seq.newBuilder[Feature]
    while (pos + 4 <= bytes.length) {
      val size = buf.getInt(pos)
      if (size <= 0 || pos + 4 + size > bytes.length) {
        pos = bytes.length
      } else {
        val froot = fb.root(pos + 4)
        val geomF = fb.field(froot, 0)
        val (gType, parts) =
          if (geomF == 0) (geometryType, Seq.empty[Array[Double]])
          else parseGeometry(fb, fb.indirect(geomF), geometryType)
        val props = {
          val pf = fb.field(froot, 1)
          if (pf == 0) Map.empty[String, Any]
          else parseProps(buf, fb.vecData(pf), fb.vecLen(pf), columns)
        }
        features += Feature(gType, parts, props)
        pos += 4 + size
      }
    }
    Layer(geometryType, envelope, columns, features.result())
  }

  /** Geometry table → flat xy parts (ends split the xy vector into rings). */
  private def parseGeometry(fb: FB, g: Int, defaultType: Int): (Int, Seq[Array[Double]]) = {
    val buf = fb.buf
    val typeF = fb.field(g, 6)
    val gType = if (typeF == 0) defaultType else buf.get(typeF) & 0xff
    val partsF = fb.field(g, 7)
    if (partsF != 0) {
      // multi-part geometry: recurse into sub-geometries
      val n = fb.vecLen(partsF); val d = fb.vecData(partsF)
      val all = (0 until n).flatMap { i =>
        parseGeometry(fb, fb.indirect(d + i * 4), gType)._2
      }
      return (gType, all)
    }
    val xyF = fb.field(g, 1)
    if (xyF == 0) return (gType, Seq.empty)
    val xyN = fb.vecLen(xyF); val xyD = fb.vecData(xyF)
    val xy = Array.tabulate(xyN)(i => buf.getDouble(xyD + i * 8))
    val endsF = fb.field(g, 0)
    if (endsF == 0) (gType, Seq(xy))
    else {
      val en = fb.vecLen(endsF); val ed = fb.vecData(endsF)
      val ends = Array.tabulate(en)(i => buf.getInt(ed + i * 4))
      var start = 0
      val parts = ends.map { e =>
        val flat = java.util.Arrays.copyOfRange(xy, start * 2, e * 2)
        start = e
        flat
      }.toSeq
      (gType, parts)
    }
  }

  /** Properties blob: repeated (ushort column index, value per column type). */
  private def parseProps(buf: ByteBuffer, data: Int, len: Int,
                         columns: Seq[Column]): Map[String, Any] = {
    val out = Map.newBuilder[String, Any]
    var p = data
    val end = data + len
    while (p + 2 <= end) {
      val ci = buf.getShort(p) & 0xffff
      p += 2
      if (ci >= columns.length) { p = end }
      else {
        val c = columns(ci)
        c.colType match {
          case 0 | 1 => out += (c.name -> buf.get(p)); p += 1        // byte
          case 2 => out += (c.name -> (buf.get(p) != 0)); p += 1     // bool
          case 3 | 4 => out += (c.name -> buf.getShort(p)); p += 2   // short
          case 5 | 6 => out += (c.name -> buf.getInt(p)); p += 4     // int
          case 7 | 8 => out += (c.name -> buf.getLong(p)); p += 8    // long
          case 9 => out += (c.name -> buf.getFloat(p)); p += 4       // float
          case 10 => out += (c.name -> buf.getDouble(p)); p += 8     // double
          case 11 | 12 =>                                            // string/json
            val n = buf.getInt(p); p += 4
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = buf.get(p + i); i += 1 }
            out += (c.name -> new String(b, StandardCharsets.UTF_8))
            p += n
          case 13 =>                                                 // datetime
            val n = buf.getInt(p); p += 4 + n
          case 14 =>                                                 // binary
            val n = buf.getInt(p); p += 4 + n
          case _ => p = end
        }
      }
    }
    out.result()
  }
}
