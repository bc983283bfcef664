package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Overlay

/**
 * Distributed drivers for the planar overlay kernel ([[graft.geom.Overlay]]):
 * mapshaper's `-clip` / `-erase` / `-union` / `-dissolve2` semantics.
 *
 * Scale model: overlay is global only per CONNECTED COMPONENT of geometry.
 * Rows carry whole shapes; co-location key = spatial cell (here: the group
 * column, at scale a cellId from [[graft.cell.CellIndex]]), so each task runs
 * the kernel on one component — the same decomposition the reference applies
 * per mosaic component (`src/polygons/mapshaper-mosaic-index.mjs`).
 */
object OverlayOp {

  /** Clip each subject shape row against a broadcast clip layer (one shape).
   * Input: (id, ring); output: (id, n_rings, area after clip). */
  def clipRows(spark: SparkSession, shapes: DataFrame, idCol: String, ringCol: String,
               clipShape: Seq[Array[Double]], erase: Boolean = false): DataFrame = {
    val bc = spark.sparkContext.broadcast(clipShape)
    val clipUdf = udf { (ring: Seq[Double]) =>
      val subject = Seq(Seq(ring.toArray))
      val out = if (erase) Overlay.erase(subject, Seq(bc.value))
                else Overlay.clip(subject, Seq(bc.value))
      val area = Overlay.layerArea(out)
      (out.length, area)
    }
    shapes
      .withColumn("_r", clipUdf(col(ringCol)))
      .select(col(idCol), col("_r._1").as("n_rings"), col("_r._2").as("clip_area"))
  }

  /** Robust per-group dissolve (mosaic based) of possibly-overlapping shapes.
   * Input: (groupCol, ring) one single-ring shape per row.
   * Output: (group, n_shapes_in, n_rings_out, area). */
  def dissolve2(spark: SparkSession, shapes: DataFrame, groupCol: String, ringCol: String): DataFrame = {
    import spark.implicits._
    shapes.select(col(groupCol).cast("long").as("g"), col(ringCol).as("ring"))
      .as[(Long, Array[Double])]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val rings = it.map(_._2).toSeq
        val out = Overlay.dissolve2(rings.map(r => Seq(r)))
        (g, rings.size.toLong, out.length.toLong, Overlay.layerArea(out))
      }
      .toDF("group", "n_shapes_in", "n_rings_out", "area")
  }
}
