package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Geom
import graft.index.PolygonLayer

/**
 * Point-derivation and per-row geometry operators, mirroring the reference's
 * `-points` (centroid/vertices, `/root/reference/src/commands/mapshaper-points.mjs:18-115`),
 * `-explode` (`mapshaper-explode.mjs:10-64`), `-affine`
 * (`mapshaper-affine.mjs:25-128`) and `-filter-geom` bbox predicate
 * (`mapshaper-filter-geom.mjs:99-110`).
 */
object Points {

  /** Polygon layer as a vertex table: (poly_key, ring, idx, x, y). */
  def vertices(spark: SparkSession, layer: PolygonLayer): DataFrame = {
    import spark.implicits._
    val rows = Seq.newBuilder[(Long, Int, Int, Double, Double)]
    var r = 0
    while (r < layer.numRings) {
      val key = layer.shapeKeys(layer.ringShape(r))
      var i = layer.ringStart(r)
      var idx = 0
      while (i < layer.ringStart(r + 1)) {
        rows += ((key, r, idx, layer.xx(i), layer.yy(i)))
        i += 1
        idx += 1
      }
      r += 1
    }
    rows.result().toDF("poly_key", "ring", "idx", "x", "y")
  }

  /** Area-weighted centroid per shape (first ring of each shape = outer). */
  def centroids(spark: SparkSession, layer: PolygonLayer): DataFrame = {
    import spark.implicits._
    (0 until layer.numShapes).map { s =>
      // centroid over all rings of the shape, area-weighted (holes have
      // negative signed area, so they subtract — matches the reference's
      // getShapeCentroid behavior for clean ring nesting)
      var a = 0.0; var cx = 0.0; var cy = 0.0
      var r = 0
      while (r < layer.numRings) {
        if (layer.ringShape(r) == s) {
          val st = layer.ringStart(r)
          val n = layer.ringStart(r + 1) - st
          var i = st
          while (i < st + n - 1) {
            val cross = layer.xx(i) * layer.yy(i + 1) - layer.xx(i + 1) * layer.yy(i)
            a += cross
            cx += (layer.xx(i) + layer.xx(i + 1)) * cross
            cy += (layer.yy(i) + layer.yy(i + 1)) * cross
            i += 1
          }
        }
        r += 1
      }
      (layer.shapeKeys(s), cx / (3.0 * a), cy / (3.0 * a), a / 2.0)
    }.toDF("poly_key", "cx", "cy", "area")
  }

  /** Affine transform columns: (x', y') = (a*x + b*y + tx, c*x + d*y + ty). */
  def affine(df: DataFrame, xCol: String, yCol: String,
             a: Double, b: Double, c: Double, d: Double, tx: Double, ty: Double): DataFrame =
    df.withColumn("ax", col(xCol) * a + col(yCol) * b + tx)
      .withColumn("ay", col(xCol) * c + col(yCol) * d + ty)

  /** The reference's `-affine rotate= scale= shift= anchor=` parameterization
   * (`mapshaper-affine.mjs:getAffineTransform`): rotation is clockwise
   * degrees about the anchor, then scale about it, then shift. Returns the
   * (a, b, c, d, tx, ty) matrix for [[affine]]. */
  def affineParams(rotateDeg: Double, scale: Double, shiftX: Double, shiftY: Double,
                   anchorX: Double, anchorY: Double): (Double, Double, Double, Double, Double, Double) = {
    val angle = rotateDeg * math.Pi / 180.0
    val a = scale * math.cos(angle)
    val b = -scale * math.sin(angle)
    // x2 = a(x-ax) - b(y-ay) + sx + ax ; y2 = b(x-ax) + a(y-ay) + sy + ay
    (a, -b, b, a,
      -a * anchorX + b * anchorY + shiftX + anchorX,
      -b * anchorX - a * anchorY + shiftY + anchorY)
  }

  /** Bbox containment predicate (filter-geom): partition-prunable plain compare. */
  def inBBox(x: Column, y: Column, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Column =
    x >= xmin && x <= xmax && y >= ymin && y <= ymax

  /** Equal-interval classification with explicit breaks (classify / colorizer). */
  def classify(v: Column, min: Double, width: Double, nBins: Int): Column =
    least(greatest(floor((v - min) / width), lit(0)), lit(nBins - 1)).cast("long")

  /** Segment midpoints of a layer (the `-points midpoints` mode). */
  def midpoints(spark: SparkSession, layer: PolygonLayer): DataFrame = {
    import spark.implicits._
    val rows = Seq.newBuilder[(Long, Int, Int, Double, Double)]
    var r = 0
    while (r < layer.numRings) {
      val key = layer.shapeKeys(layer.ringShape(r))
      var i = layer.ringStart(r)
      var seg = 0
      while (i < layer.ringStart(r + 1) - 1) {
        rows += ((key, r, seg,
          (layer.xx(i) + layer.xx(i + 1)) / 2.0,
          (layer.yy(i) + layer.yy(i + 1)) / 2.0))
        i += 1
        seg += 1
      }
      r += 1
    }
    rows.result().toDF("poly_key", "ring", "seg", "mx", "my")
  }

  /** `-points endpoints=`: first and last vertex of each path
   * (`mapshaper-points.mjs` endpoints mode). Pure built-in element access —
   * codegen, no shuffle. Output: idCol + (which: 'start'|'end', x, y). */
  def endpoints(lines: org.apache.spark.sql.DataFrame, idCol: String,
                lineCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val l = col(lineCol)
    val n = size(l)
    lines.select(col(idCol), explode(array(
      struct(lit("start").as("which"),
        element_at(l, 1).as("x"), element_at(l, 2).as("y")),
      struct(lit("end").as("which"),
        element_at(l, n - 1).as("x"), element_at(l, n).as("y")))).as("p"))
      .select(col(idCol), col("p.which"), col("p.x"), col("p.y"))
  }

  /** `-points` from a WKT field (`mapshaper-points.mjs` wkt mode; semantics
   * of `parseWKTPoint`, `test/points-test.mjs:186-190`: case-insensitive,
   * `POINT Z/M/ZM` keep only x,y, non-POINT types yield null): extracts x/y
   * via codegen `regexp_extract` — no UDF. */
  def fromWkt(df: org.apache.spark.sql.DataFrame, wktCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val pat = "(?i)^\\s*POINT\\s*(?:ZM|Z|M)?\\s*\\(\\s*([-+0-9.eE]+)\\s+([-+0-9.eE]+)"
    df.withColumn("x", try_cast_double(regexp_extract(col(wktCol), pat, 1)))
      .withColumn("y", try_cast_double(regexp_extract(col(wktCol), pat, 2)))
  }

  /** ANSI-safe string→double: empty/non-numeric → null (non-POINT rows). */
  private def try_cast_double(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(c === "", lit(null).cast("double")).otherwise(c.cast("double"))
  }

  /** Points interpolated along a path at a fixed interval (the `-points
   * interpolated` mode, `mapshaper-points.mjs` interval sampling). */
  def interpolate(flat: Array[Double], interval: Double): Array[Double] = {
    require(interval > 0)
    var total = 0.0
    var i = 0
    while (i + 3 < flat.length) {
      total += Geom.distance(flat(i), flat(i + 1), flat(i + 2), flat(i + 3))
      i += 2
    }
    val out = Array.newBuilder[Double]
    out += flat(0); out += flat(1)
    var acc = 0.0
    var next = interval
    val eps = 1e-12 * math.max(1.0, total)
    i = 0
    while (i + 3 < flat.length) {
      val x1 = flat(i); val y1 = flat(i + 1)
      val x2 = flat(i + 2); val y2 = flat(i + 3)
      val d = Geom.distance(x1, y1, x2, y2)
      while (next <= acc + d + eps && next < total - eps) {
        val t = (next - acc) / d
        out += x1 + (x2 - x1) * t
        out += y1 + (y2 - y1) * t
        next += interval
      }
      acc += d
      i += 2
    }
    out.result()
  }

  /**
   * Inner/anchor point of a shape: maximizes distance to the boundary
   * (reference: `src/points/mapshaper-anchor-points.mjs` — used for labels
   * and point-method polygon joins). Polylabel-style grid refinement: coarse
   * grid over the bbox, keep the best interior cell center, refine around it.
   */
  def anchor(layer: PolygonLayer, shape: Int, iterations: Int = 4): (Double, Double) = {
    val rings = (0 until layer.numRings).filter(layer.ringShape(_) == shape)
    def distToBoundary(x: Double, y: Double): Double = {
      var best = Double.MaxValue
      rings.foreach { r =>
        var i = layer.ringStart(r)
        while (i < layer.ringStart(r + 1) - 1) {
          val d = pointSegDist(x, y, layer.xx(i), layer.yy(i), layer.xx(i + 1), layer.yy(i + 1))
          if (d < best) best = d
          i += 1
        }
      }
      best
    }
    def inside(x: Double, y: Double): Boolean =
      Geom.combineRings(rings.iterator.map(r =>
        Geom.pointInRing(x, y, layer.xx, layer.yy, layer.ringStart(r),
          layer.ringStart(r + 1) - layer.ringStart(r))))

    var (x0, y0, x1, y1) = {
      var a = Double.MaxValue; var b = Double.MaxValue
      var c = Double.MinValue; var d = Double.MinValue
      rings.foreach { r =>
        val (bx0, by0, bx1, by1) = Geom.bounds(layer.xx, layer.yy,
          layer.ringStart(r), layer.ringStart(r + 1) - layer.ringStart(r))
        a = math.min(a, bx0); b = math.min(b, by0)
        c = math.max(c, bx1); d = math.max(d, by1)
      }
      (a, b, c, d)
    }
    var best = ((x0 + x1) / 2, (y0 + y1) / 2)
    var bestD = if (inside(best._1, best._2)) distToBoundary(best._1, best._2) else -1.0
    var it = 0
    while (it < iterations) {
      val n = 8
      var gy = 0
      while (gy <= n) {
        var gx = 0
        while (gx <= n) {
          val px = x0 + (x1 - x0) * gx / n
          val py = y0 + (y1 - y0) * gy / n
          if (inside(px, py)) {
            val d = distToBoundary(px, py)
            if (d > bestD) { bestD = d; best = (px, py) }
          }
          gx += 1
        }
        gy += 1
      }
      // refine around current best
      val w = (x1 - x0) / n
      val h = (y1 - y0) / n
      x0 = best._1 - w; x1 = best._1 + w
      y0 = best._2 - h; y1 = best._2 + h
      it += 1
    }
    best
  }

  private def pointSegDist(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return Geom.distance(px, py, ax, ay)
    var t = ((px - ax) * dx + (py - ay) * dy) / len2
    if (t < 0) t = 0 else if (t > 1) t = 1
    Geom.distance(px, py, ax + dx * t, ay + dy * t)
  }
}
