package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * `-o` export fan-out beyond GeoJSON/TopoJSON: Shapefile (.shp/.shx), dBASE
 * (.dbf), SVG, and zip/gzip containers — the writer side of the reference's
 * io stack (`/root/reference/src/shapefile/shp-export.mjs`,
 * `src/shapefile/dbf-export.mjs` via dbf-writer, `src/svg/`,
 * `src/io/mapshaper-zip.mjs`). All formats from their public specs
 * (ESRI whitepaper, dBASE III, SVG 1.1).
 */
object Export {

  // ------------------------------------------------------------- shapefile

  /** Write polygon shapes (key order preserved; multi-ring per shape) to
   * .shp bytes; returns (shp, shx). */
  def writePolygonShp(shapes: Seq[Seq[Array[Double]]]): (Array[Byte], Array[Byte]) =
    writeShp(shapes, 5)

  /** Write polyline shapes to .shp bytes; returns (shp, shx). */
  def writePolylineShp(shapes: Seq[Seq[Array[Double]]]): (Array[Byte], Array[Byte]) =
    writeShp(shapes, 3)

  /** Write point records to .shp bytes; returns (shp, shx). */
  def writePointShp(points: Seq[(Double, Double)]): (Array[Byte], Array[Byte]) = {
    val contentBytes = 4 + 16 // type + x,y
    val total = 100 + points.length * (8 + contentBytes)
    val buf = ByteBuffer.allocate(total)
    val shx = ByteBuffer.allocate(100 + points.length * 8)
    val bbox = bboxOf(points.map(p => Array(p._1, p._2, p._1, p._2)).map(a => Seq(a)))
    header(buf, total, 1, bbox)
    header(shx, shx.capacity(), 1, bbox)
    var pos = 100
    points.zipWithIndex.foreach { case ((x, y), i) =>
      shx.order(ByteOrder.BIG_ENDIAN).putInt(100 + i * 8, pos / 2)
      shx.putInt(100 + i * 8 + 4, contentBytes / 2)
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1).putInt(pos + 4, contentBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(pos + 8, 1).putDouble(pos + 12, x).putDouble(pos + 20, y)
      pos += 8 + contentBytes
    }
    (buf.array(), shx.array())
  }

  private def bboxOf(shapes: Seq[Seq[Array[Double]]]): Array[Double] = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = -Double.MaxValue; var y1 = -Double.MaxValue
    shapes.foreach(_.foreach { r =>
      var i = 0
      while (i + 1 < r.length) {
        x0 = math.min(x0, r(i)); x1 = math.max(x1, r(i))
        y0 = math.min(y0, r(i + 1)); y1 = math.max(y1, r(i + 1))
        i += 2
      }
    })
    Array(x0, y0, x1, y1)
  }

  private def header(buf: ByteBuffer, totalBytes: Int, shpType: Int, bbox: Array[Double]): Unit = {
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, totalBytes / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000)
    buf.putInt(32, shpType)
    buf.putDouble(36, bbox(0)).putDouble(44, bbox(1))
    buf.putDouble(52, bbox(2)).putDouble(60, bbox(3))
  }

  private def writeShp(shapes: Seq[Seq[Array[Double]]], shpType: Int): (Array[Byte], Array[Byte]) = {
    val contentSizes = shapes.map { rings =>
      val numPoints = rings.map(_.length / 2).sum
      4 + 32 + 4 + 4 + rings.length * 4 + numPoints * 16
    }
    val total = 100 + shapes.length * 8 + contentSizes.sum
    val buf = ByteBuffer.allocate(total)
    val shx = ByteBuffer.allocate(100 + shapes.length * 8)
    val bbox = bboxOf(shapes)
    header(buf, total, shpType, bbox)
    header(shx, shx.capacity(), shpType, bbox)
    var pos = 100
    shapes.zipWithIndex.foreach { case (rings, i) =>
      val content = contentSizes(i)
      shx.order(ByteOrder.BIG_ENDIAN).putInt(100 + i * 8, pos / 2)
      shx.putInt(100 + i * 8 + 4, content / 2)
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1).putInt(pos + 4, content / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val c = pos + 8
      buf.putInt(c, shpType)
      val sb = bboxOf(Seq(rings))
      buf.putDouble(c + 4, sb(0)).putDouble(c + 12, sb(1))
        .putDouble(c + 20, sb(2)).putDouble(c + 28, sb(3))
      buf.putInt(c + 36, rings.length)
      val numPoints = rings.map(_.length / 2).sum
      buf.putInt(c + 40, numPoints)
      var partStart = 0
      rings.zipWithIndex.foreach { case (r, p) =>
        buf.putInt(c + 44 + p * 4, partStart)
        partStart += r.length / 2
      }
      val ptsOff = c + 44 + rings.length * 4
      var k = 0
      rings.foreach { r =>
        var j = 0
        while (j + 1 < r.length) {
          buf.putDouble(ptsOff + k * 16, r(j))
          buf.putDouble(ptsOff + k * 16 + 8, r(j + 1))
          k += 1; j += 2
        }
      }
      pos += 8 + content
    }
    (buf.array(), shx.array())
  }

  // ------------------------------------------------------------------ dbf

  /** Write a dBASE III table. Fields: (name, 'C'|'N', length, decimals).
   * Row values: String or Double/Long (numeric), null allowed. */
  def writeDbf(fields: Seq[(String, Char, Int, Int)], rows: Seq[Seq[Any]]): Array[Byte] = {
    val recordSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + fields.length * 32 + 1
    val total = headerSize + rows.length * recordSize + 1
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x03.toByte)
    buf.put(1, 95.toByte); buf.put(2, 7.toByte); buf.put(3, 26.toByte) // Y2K-style date
    buf.putInt(4, rows.length)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, typ, len, dec), i) =>
      val off = 32 + i * 32
      val nb = name.getBytes(StandardCharsets.US_ASCII).take(10)
      var j = 0
      while (j < nb.length) { buf.put(off + j, nb(j)); j += 1 }
      buf.put(off + 11, typ.toByte)
      buf.put(off + 16, len.toByte)
      buf.put(off + 17, dec.toByte)
    }
    buf.put(32 + fields.length * 32, 0x0d.toByte)
    var pos = headerSize
    rows.foreach { row =>
      buf.put(pos, ' '.toByte)
      var off = pos + 1
      fields.zip(row).foreach { case ((_, typ, len, dec), v) =>
        val s = typ match {
          case 'N' =>
            val str = v match {
              case null => ""
              case d: Double => if (dec == 0) d.toLong.toString else s"%.${dec}f".format(d)
              case l: Long => l.toString
              case i: Int => i.toString
              case other => other.toString
            }
            (" " * math.max(0, len - str.length)) + str.takeRight(len) // right-justified
          case _ =>
            val str = if (v == null) "" else v.toString
            str.take(len) + (" " * math.max(0, len - math.min(str.length, len)))
        }
        val bytes = s.getBytes(StandardCharsets.US_ASCII)
        var j = 0
        while (j < len) { buf.put(off + j, if (j < bytes.length) bytes(j) else ' '.toByte); j += 1 }
        off += len
      }
      pos += recordSize
    }
    buf.put(total - 1, 0x1a.toByte)
    buf.array()
  }

  // ------------------------------------------------------------------ svg

  /** Render rings/paths to an SVG document (y flipped; viewBox = data bbox),
   * mirroring the reference's path output shape (`src/svg/`). */
  def writeSvg(shapes: Seq[(Seq[Array[Double]], String)], precision: Int = 2): String = {
    val bbox = bboxOf(shapes.map(_._1).flatten.map(r => Seq(r)))
    val h = bbox(3) - bbox(1)
    def fmt(v: Double): String = s"%.${precision}f".format(v)
    val paths = shapes.map { case (rings, style) =>
      val d = rings.map { r =>
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < r.length) {
          sb.append(if (i == 0) "M" else "L")
          sb.append(fmt(r(i) - bbox(0))).append(" ").append(fmt(bbox(3) - r(i + 1)))
          i += 2
        }
        sb.append("Z").toString
      }.mkString(" ")
      s"""<path d="$d" $style/>"""
    }
    s"""<?xml version="1.0"?>
       |<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 ${fmt(bbox(2) - bbox(0))} ${fmt(h)}">
       |${paths.mkString("\n")}
       |</svg>""".stripMargin
  }

  // ----------------------------------------------------------- containers

  /** Zip a set of named files into one archive (e.g. shp+shx+dbf, or kmz). */
  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Read all entries of a zip archive. */
  def unzip(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += ((e.getName, zis.readAllBytes()))
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] =
    new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes)).readAllBytes()

  // --------------------------------------------------------- bbox sidecar

  /** `-o bbox-index`: the reference's export manifest — a JSON array of
   * `{"bbox":[xmin,ymin,xmax,ymax],"name":<layer>}` per exported layer
   * (ref src/io/mapshaper-export.mjs:207-223 createIndexFile), written as
   * `bbox-index.json` next to the other outputs. Numbers are formatted with
   * the exact JS `Number::toString` rules so the manifest is byte-identical
   * to JSON.stringify output. */
  def bboxIndexJson(layers: Seq[(String, Seq[Seq[Array[Double]]])]): String =
    layers.map { case (name, shapes) =>
      val b = bboxOf(shapes)
      s"""{"bbox":[${jsNumber(b(0))},${jsNumber(b(1))},${jsNumber(b(2))},${jsNumber(b(3))}],""" +
        s""""name":${jsonString(name)}}"""
    }.mkString("[", ",", "]")

  /** ECMA-262 Number::toString(10) over the shortest-round-trip digits:
   * plain decimal while the decimal exponent n is in (-6, 21], JS-style
   * `d.dddde±k` outside — Java's Double.toString switches to E-notation at
   * 1e7 where JS stays plain, so the JDK form is re-assembled here.
   * JSON.stringify maps non-finite values to null and -0 to "0". */
  def jsNumber(v: Double): String = {
    if (v.isNaN || v.isInfinite) return "null"
    if (v == 0.0) return "0"
    val neg = v < 0
    val s = java.lang.Double.toString(math.abs(v)) // shortest digits (JDK 19+)
    val (mant, e10) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val rawDigits = mant.replace(".", "")
    val lead = rawDigits.indexWhere(_ != '0') // "0.00123" -> 3 leading zeros
    val digits0 = rawDigits.substring(lead)
    val digits = digits0.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case d => d
    }
    // value = 0.<digits> * 10^n
    val n = dot - lead + e10
    val k = digits.length
    val body =
      if (n >= k && n <= 21) digits + ("0" * (n - k))
      else if (n > 0 && n <= 21) digits.substring(0, n) + "." + digits.substring(n)
      else if (n > -6 && n <= 0) "0." + ("0" * -n) + digits
      else {
        val expo = n - 1
        val m = if (k == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
        m + "e" + (if (expo >= 0) "+" else "") + expo
      }
    if (neg) "-" + body else body
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""
}
