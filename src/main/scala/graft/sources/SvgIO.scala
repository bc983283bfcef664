package graft.sources

import scala.collection.mutable

/**
 * SVG import — the inverse of [[Export.writeSvg]] and a general reader for
 * the geometry subset of SVG the reference round-trips (`src/svg/`,
 * geojson-from-svg): `<path>` data with M/L/H/V/Z (absolute and relative)
 * plus C/Q curves (flattened deterministically), and the shape elements
 * `<polygon> <polyline> <rect> <line> <circle> <ellipse>`.
 *
 * Coordinates are returned in SVG space (y down); callers that want map
 * space invert with the viewBox the exporter wrote. Styling attributes are
 * preserved as a string map so exported furniture/annotations survive a
 * round trip.
 */
object SvgIO {

  /** One SVG geometry element: kind = path|polygon|polyline|rect|line|circle|ellipse;
   * parts = flat [x0,y0,x1,y1,…] subpaths (closed subpaths end with a copy
   * of their first point). */
  final case class Feature(kind: String, parts: Seq[Array[Double]], attrs: Map[String, String])

  private val ElemRe = """<(path|polygon|polyline|rect|line|circle|ellipse)\b([^>]*?)/?>""".r
  // both quote styles are valid XML: x="1" and x='1'
  private val AttrRe = """([\w:-]+)\s*=\s*(?:"([^"]*)"|'([^']*)')""".r
  private val NumRe = """[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?""".r

  /** Curve flattening steps (fixed — deterministic output). */
  final val CurveSteps = 16

  def read(svg: String): Seq[Feature] =
    ElemRe.findAllMatchIn(svg).map { m =>
      val tag = m.group(1)
      val attrs = AttrRe.findAllMatchIn(m.group(2))
        .map(a => a.group(1) -> Option(a.group(2)).getOrElse(a.group(3))).toMap
      def d(name: String, dflt: Double = 0.0): Double =
        attrs.get(name).map(_.toDouble).getOrElse(dflt)
      tag match {
        case "path" =>
          Feature("path", parsePathData(attrs.getOrElse("d", "")), attrs - "d")
        case "polygon" =>
          val pts = NumRe.findAllIn(attrs.getOrElse("points", "")).map(_.toDouble).toArray
          val closed = if (pts.length >= 4 &&
            (pts(0) != pts(pts.length - 2) || pts(1) != pts(pts.length - 1)))
            pts ++ Array(pts(0), pts(1)) else pts
          Feature("polygon", Seq(closed), attrs - "points")
        case "polyline" =>
          Feature("polyline",
            Seq(NumRe.findAllIn(attrs.getOrElse("points", "")).map(_.toDouble).toArray),
            attrs - "points")
        case "rect" =>
          val x = d("x"); val y = d("y"); val w = d("width"); val h = d("height")
          Feature("rect", Seq(Array(x, y, x + w, y, x + w, y + h, x, y + h, x, y)), attrs)
        case "line" =>
          Feature("line", Seq(Array(d("x1"), d("y1"), d("x2"), d("y2"))), attrs)
        case "circle" | "ellipse" =>
          val cx = d("cx"); val cy = d("cy")
          val rx = if (tag == "circle") d("r") else d("rx")
          val ry = if (tag == "circle") d("r") else d("ry")
          val n = 32
          val ring = new Array[Double]((n + 1) * 2)
          var i = 0
          while (i < n) {
            val a = 2.0 * math.Pi * i / n
            ring(i * 2) = cx + rx * math.cos(a)
            ring(i * 2 + 1) = cy + ry * math.sin(a)
            i += 1
          }
          ring(n * 2) = ring(0); ring(n * 2 + 1) = ring(1)
          Feature(tag, Seq(ring), attrs)
      }
    }.toSeq

  /** Parse SVG path data into flat subpaths. Supported commands:
   * M/m L/l H/h V/v Z/z C/c Q/q (curves flattened at [[CurveSteps]]);
   * anything else throws with the offending command letter. */
  def parsePathData(data: String): Seq[Array[Double]] = {
    val out = Seq.newBuilder[Array[Double]]
    val cur = mutable.ArrayBuffer.empty[Double]
    var cx = 0.0; var cy = 0.0     // current point
    var sx = 0.0; var sy = 0.0     // subpath start (for Z)
    val tokens = tokenize(data)
    var ti = 0

    def flush(): Unit = {
      if (cur.length >= 4) out += cur.toArray
      cur.clear()
    }
    def start(x: Double, y: Double): Unit = {
      flush()
      cx = x; cy = y; sx = x; sy = y
      cur += x; cur += y
    }
    def lineTo(x: Double, y: Double): Unit = { cx = x; cy = y; cur += x; cur += y }
    def num(): Double = { val v = tokens(ti).asInstanceOf[Double]; ti += 1; v }
    def hasNum: Boolean = ti < tokens.length && tokens(ti).isInstanceOf[Double]

    def cubic(x1: Double, y1: Double, x2: Double, y2: Double, x3: Double, y3: Double): Unit = {
      val (x0, y0) = (cx, cy)
      var k = 1
      while (k <= CurveSteps) {
        val t = k.toDouble / CurveSteps
        val u = 1.0 - t
        lineTo(u * u * u * x0 + 3 * u * u * t * x1 + 3 * u * t * t * x2 + t * t * t * x3,
          u * u * u * y0 + 3 * u * u * t * y1 + 3 * u * t * t * y2 + t * t * t * y3)
        k += 1
      }
    }
    def quad(x1: Double, y1: Double, x2: Double, y2: Double): Unit = {
      val (x0, y0) = (cx, cy)
      var k = 1
      while (k <= CurveSteps) {
        val t = k.toDouble / CurveSteps
        val u = 1.0 - t
        lineTo(u * u * x0 + 2 * u * t * x1 + t * t * x2,
          u * u * y0 + 2 * u * t * y1 + t * t * y2)
        k += 1
      }
    }

    while (ti < tokens.length) {
      val cmd = tokens(ti).asInstanceOf[Char]; ti += 1
      cmd match {
        case 'M' => start(num(), num()); while (hasNum) lineTo(num(), num())
        case 'm' =>
          val dx = num(); val dy = num()
          start(cx + dx, cy + dy)
          while (hasNum) lineTo(cx + num(), cy + num())
        case 'L' => while (hasNum) lineTo(num(), num())
        case 'l' => while (hasNum) lineTo(cx + num(), cy + num())
        case 'H' => while (hasNum) lineTo(num(), cy)
        case 'h' => while (hasNum) lineTo(cx + num(), cy)
        case 'V' => while (hasNum) lineTo(cx, num())
        case 'v' => while (hasNum) lineTo(cx, cy + num())
        case 'C' => while (hasNum) cubic(num(), num(), num(), num(), num(), num())
        case 'c' => while (hasNum)
          cubic(cx + num(), cy + num(), cx + num(), cy + num(), cx + num(), cy + num())
        case 'Q' => while (hasNum) quad(num(), num(), num(), num())
        case 'q' => while (hasNum) quad(cx + num(), cy + num(), cx + num(), cy + num())
        case 'Z' | 'z' =>
          // close the subpath unless the pen is already back at its start
          if (cur.length >= 2 && (cx != sx || cy != sy)) lineTo(sx, sy)
        case other =>
          throw new IllegalArgumentException(s"unsupported SVG path command '$other'")
      }
    }
    flush()
    out.result()
  }

  /** Split path data into command chars and numbers. */
  private def tokenize(d: String): IndexedSeq[Any] = {
    val out = IndexedSeq.newBuilder[Any]
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (c.isLetter) { out += c; i += 1 }
      else if (c == ',' || c.isWhitespace) i += 1
      else {
        val m = NumRe.findPrefixOf(d.substring(i))
          .getOrElse(throw new IllegalArgumentException(s"bad path data at offset $i: $d"))
        out += m.toDouble
        i += m.length
      }
    }
    out.result()
  }

  /** Map imported SVG coordinates back to data space given the viewBox the
   * exporter wrote: x_data = x_svg + xmin, y_data = ymax − y_svg. */
  def svgToData(parts: Seq[Array[Double]], xmin: Double, ymax: Double): Seq[Array[Double]] =
    parts.map { p =>
      val o = new Array[Double](p.length)
      var i = 0
      while (i + 1 < p.length) {
        o(i) = p(i) + xmin
        o(i + 1) = ymax - p(i + 1)
        i += 2
      }
      o
    }
}
