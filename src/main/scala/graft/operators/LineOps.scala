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
