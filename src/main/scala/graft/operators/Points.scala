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

  /** Bbox containment predicate (filter-geom): partition-prunable plain compare. */
  def inBBox(x: Column, y: Column, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Column =
    x >= xmin && x <= xmax && y >= ymin && y <= ymax

  /** Equal-interval classification with explicit breaks (classify / colorizer). */
  def classify(v: Column, min: Double, width: Double, nBins: Int): Column =
    least(greatest(floor((v - min) / width), lit(0)), lit(nBins - 1)).cast("long")
}
