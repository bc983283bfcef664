package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Recursive bisection of a point set — the reference's `-subdivide`
 * (`/root/reference/src/commands/mapshaper-subdivide.mjs:15`): split while a
 * predicate holds (here: leaf row count > maxPerLeaf), alternating the split
 * axis on the longer side. Driver-directed quadtree over DISTRIBUTED counts:
 * each round computes per-leaf counts + medians with one aggregation, so the
 * loop depth is O(log n) Spark jobs regardless of data size.
 */
object Subdivide {

  final case class Leaf(id: Long, xmin: Double, ymin: Double, xmax: Double, ymax: Double, count: Long)

  /**
   * Assign each point a leaf id such that every leaf holds ≤ maxPerLeaf
   * points (unless maxDepth hit). Returns (points + leaf_id column, leaves).
   * Splits at the leaf's bbox midpoint on its longer axis — deterministic.
   */
  def byCount(spark: SparkSession, points: DataFrame, xCol: String, yCol: String,
              maxPerLeaf: Long, maxDepth: Int = 24): (DataFrame, Seq[Leaf]) = {
    import spark.implicits._
    val pts = points.select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .cache()
    val ext = pts.agg(min("x"), min("y"), max("x"), max("y")).head()
    var leaves = Map(1L -> ((ext.getDouble(0), ext.getDouble(1),
      ext.getDouble(2) + 1e-9, ext.getDouble(3) + 1e-9)))
    var depth = 0
    var changed = true
    // leaf id scheme: root=1; children of k = 2k and 2k+1 (binary split)
    while (changed && depth < maxDepth) {
      val cur = leaves
      val bc = spark.sparkContext.broadcast(cur)
      val leafUdf = udf { (x: Double, y: Double) =>
        var id = 1L
        var continue = true
        while (continue) {
          val m = bc.value
          m.get(id * 2).orElse(m.get(id * 2 + 1)) match {
            case None => continue = false
            case Some(_) =>
              val (x0, y0, x1, y1) = m(id)
              val splitX = (x1 - x0) >= (y1 - y0)
              val lo = if (splitX) x < (x0 + x1) / 2 else y < (y0 + y1) / 2
              id = if (lo) id * 2 else id * 2 + 1
          }
        }
        id
      }
      val counts = pts.withColumn("leaf", leafUdf(col("x"), col("y")))
        .groupBy("leaf").count().as[(Long, Long)].collect().toMap
      val over = cur.keys.filter { id =>
        !cur.contains(id * 2) && counts.getOrElse(id, 0L) > maxPerLeaf
      }
      changed = over.nonEmpty
      over.foreach { id =>
        val (x0, y0, x1, y1) = cur(id)
        if ((x1 - x0) >= (y1 - y0)) {
          val mx = (x0 + x1) / 2
          leaves += (id * 2) -> ((x0, y0, mx, y1))
          leaves += (id * 2 + 1) -> ((mx, y0, x1, y1))
        } else {
          val my = (y0 + y1) / 2
          leaves += (id * 2) -> ((x0, y0, x1, my))
          leaves += (id * 2 + 1) -> ((x0, my, x1, y1))
        }
      }
      depth += 1
    }
    val finalMap = leaves
    val bc = spark.sparkContext.broadcast(finalMap)
    val leafUdf = udf { (x: Double, y: Double) =>
      var id = 1L
      var continue = true
      while (continue) {
        val m = bc.value
        if (!m.contains(id * 2) && !m.contains(id * 2 + 1)) continue = false
        else {
          val (x0, y0, x1, y1) = m(id)
          val splitX = (x1 - x0) >= (y1 - y0)
          val lo = if (splitX) x < (x0 + x1) / 2 else y < (y0 + y1) / 2
          id = if (lo) id * 2 else id * 2 + 1
        }
      }
      id
    }
    val assigned = points.withColumn("leaf_id",
      leafUdf(col(xCol).cast("double"), col(yCol).cast("double")))
    val leafCounts = assigned.groupBy("leaf_id").count().as[(Long, Long)].collect().toMap
    val leafSeq = finalMap.toSeq
      .filter { case (id, _) => !finalMap.contains(id * 2) && !finalMap.contains(id * 2 + 1) }
      .map { case (id, (x0, y0, x1, y1)) => Leaf(id, x0, y0, x1, y1, leafCounts.getOrElse(id, 0L)) }
      .sortBy(_.id)
    (assigned, leafSeq)
  }
}
