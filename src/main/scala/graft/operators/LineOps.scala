package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Overlay
import graft.index.PolygonLayer

/**
 * Polyline operators:
 *
 *  - [[clipLines]] / erase — polyline clipping against a polygon layer
 *    (`/root/reference/src/clipping/mapshaper-polyline-clipping.mjs:5-35`:
 *    divide arcs at intersections, keep enclosed (clip) or excluded (erase)
 *    pieces). Per-row kernel over [[Buffer.divideLine]]; the clip layer is
 *    broadcast.
 *  - [[joinToPolygons]] — polyline→polygon join via per-part path midpoints
 *    (`src/join/mapshaper-polyline-polygon-join.mjs:5-27`: polylines are
 *    reduced to length-midpoints, then point→polygon joined).
 *  - [[pathMidpoint]] — the point at half the path length, linearly
 *    interpolated on the containing segment
 *    (`src/paths/mapshaper-polyline-to-point.mjs:20-49`).
 */
object LineOps {

  /** Midpoint (half total length) of a flat [x0,y0,x1,y1,...] path. */
  def pathMidpoint(flat: Array[Double]): Array[Double] = {
    var total = 0.0
    var i = 0
    while (i + 3 < flat.length) {
      total += math.hypot(flat(i + 2) - flat(i), flat(i + 3) - flat(i + 1))
      i += 2
    }
    val halfLen = total / 2.0
    if (halfLen <= 0) return Array(flat(0), flat(1))
    var partial = 0.0
    i = 0
    while (i + 3 < flat.length) {
      val a = flat(i); val b = flat(i + 1)
      val c = flat(i + 2); val d = flat(i + 3)
      val segLen = math.hypot(c - a, d - b)
      if (partial + segLen >= halfLen) {
        val k = (halfLen - partial) / segLen
        return Array((1.0 - k) * a + k * c, (1.0 - k) * b + k * d)
      }
      partial += segLen
      i += 2
    }
    Array(flat(flat.length - 2), flat(flat.length - 1))
  }

  /**
   * Clip (keep inside) or erase (keep outside) polylines against one polygon
   * shape. Input: (idCol, lineCol: flat coords). Output: one row per piece
   * (id, piece, piece_len).
   */
  def clipLines(spark: SparkSession, lines: DataFrame, idCol: String, lineCol: String,
                shape: Overlay.Shape, erase: Boolean = false): DataFrame = {
    val bc = spark.sparkContext.broadcast(shape)
    val keepInside = !erase
    val piecesUdf = udf { (line: Seq[Double]) =>
      Buffer.divideLine(line.toArray, bc.value)
        .filter(_._2 == keepInside)
        .map { case (piece, _) =>
          var len = 0.0
          var i = 0
          while (i + 3 < piece.length) {
            len += math.hypot(piece(i + 2) - piece(i), piece(i + 3) - piece(i + 1))
            i += 2
          }
          (piece, len)
        }
    }
    lines
      .withColumn("_p", explode(piecesUdf(col(lineCol))))
      .select(col(idCol), col("_p._1").as("piece"), col("_p._2").as("piece_len"))
  }

  /** Polyline→polygon join: path midpoints broadcast-PIP-joined; one output
   * row per (line, enclosing polygon). */
  def joinToPolygons(spark: SparkSession, lines: DataFrame, idCol: String, lineCol: String,
                     layer: PolygonLayer): DataFrame = {
    val midUdf = udf((line: Seq[Double]) => pathMidpoint(line.toArray))
    val mids = lines
      .withColumn("_mid", midUdf(col(lineCol)))
      .withColumn("mx", col("_mid")(0))
      .withColumn("my", col("_mid")(1))
      .drop("_mid")
    SpatialJoin.broadcastJoin(spark, mids, "mx", "my", layer)
  }
}

/**
 * `-dashlines` — split polylines into dash parts (reference
 * `mapshaper-dashlines.mjs:58-122`, planar form): walk the path accumulating
 * arc length; break every `interval`, alternating dash/gap when gapLen > 0
 * (gapped lines start with a HALF-gap so rings and intersecting lines meet
 * cleanly); a break within 0.1% of the final endpoint snaps to it so FP
 * rounding never emits a micro-segment. Runs per line inside a map — no
 * shuffle.
 */
object DashLines {
  import org.apache.spark.sql.functions._

  /** Dash pieces of one flat path; gapLen 0 = pure segmentation. */
  def dashParts(flat: Array[Double], dashLen: Double, gapLen: Double): Seq[Array[Double]] = {
    require(dashLen > 0, "dash length must be positive")
    require(gapLen >= 0, "gap length must be non-negative")
    val parts = Seq.newBuilder[Array[Double]]
    var inDash = gapLen == 0
    var interval = if (inDash) dashLen else gapLen * 0.5 // half-gap start
    val cur = scala.collection.mutable.ArrayBuffer.empty[Double]

    def addPart(): Unit = {
      if (inDash && cur.length >= 4) parts += cur.toArray
      if (gapLen > 0) {
        inDash = !inDash
        interval = if (inDash) dashLen else gapLen
      }
    }

    if (flat.length < 4) return Seq.empty
    var px = flat(0); var py = flat(1)
    cur += px; cur += py
    var elapsed = 0.0
    var i = 2
    val lastIdx = flat.length - 2
    while (i + 1 < flat.length) {
      var ax = px; var ay = py
      px = flat(i); py = flat(i + 1)
      var segLen = graft.geom.Geom.distance(ax, ay, px, py)
      if (segLen > 0) {
        var continue = true
        while (continue && elapsed + segLen >= interval) {
          var pct = (interval - elapsed) / segLen
          if (pct > 0.999 && i == lastIdx) pct = 1.0
          val (bx, by) =
            if (pct < 1) (ax + (px - ax) * pct, ay + (py - ay) * pct)
            else (px, py)
          cur += bx; cur += by
          addPart()
          cur.clear()
          if (pct < 1) { cur += bx; cur += by }
          ax = bx; ay = by
          elapsed = 0.0
          segLen = (1 - pct) * segLen
          if (segLen == 0) continue = false
        }
        cur += px; cur += py // reference pushes p unconditionally after breaks
        elapsed += segLen
      }
      i += 2
    }
    if (elapsed > 0 && cur.length >= 4) addPart()
    parts.result()
  }

  /** DataFrame form: one row per dash piece (id, part, piece, piece_len). */
  def apply(lines: org.apache.spark.sql.DataFrame, idCol: String, lineCol: String,
            dashLen: Double, gapLen: Double): org.apache.spark.sql.DataFrame = {
    val partsUdf = udf { (line: Seq[Double]) =>
      dashParts(line.toArray, dashLen, gapLen).map { p =>
        var len = 0.0
        var i = 0
        while (i + 3 < p.length) {
          len += graft.geom.Geom.distance(p(i), p(i + 1), p(i + 2), p(i + 3))
          i += 2
        }
        (p, len)
      }
    }
    lines
      .select(col(idCol), posexplode(partsUdf(col(lineCol))).as(Seq("part", "_p")))
      .select(col(idCol), col("part"),
        col("_p._1").as("piece"), col("_p._2").as("piece_len"))
  }
}
