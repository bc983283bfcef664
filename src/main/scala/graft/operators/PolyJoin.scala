package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.geom.Overlay

/**
 * Polygon→polygon join via the planar mosaic — the reference's
 * `-join` with polygon targets and polygon source
 * (`/root/reference/src/join/mapshaper-join-polygons-via-mosaic.mjs:13-39,181-283`):
 * both layers are cut into one mosaic; a target matches every source sharing
 * at least one tile; `largest-overlap` keeps the source with the maximum
 * shared area; `interpolate=` area-weights numeric source fields.
 */
object PolyJoin {

  type Keyed = (Long, Overlay.Shape)

  /** Shared area per (targetKey, sourceKey) pair, from one shared mosaic. */
  def overlapAreas(targets: Seq[Keyed], sources: Seq[Keyed]): Seq[(Long, Long, Double)] = {
    val m = Overlay.mosaic(targets.map(_._2) ++ sources.map(_._2))
    val nt = targets.length
    val acc = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    m.faces.foreach { f =>
      val a = Overlay.faceArea(f)
      var ti = 0
      while (ti < nt) {
        if (f.inLayer(ti)) {
          var si = 0
          while (si < sources.length) {
            if (f.inLayer(nt + si)) {
              val k = (targets(ti)._1, sources(si)._1)
              acc.update(k, acc.getOrElse(k, 0.0) + a)
            }
            si += 1
          }
        }
        ti += 1
      }
    }
    acc.toSeq.map { case ((t, s), a) => (t, s, a) }.sortBy(p => (p._1, p._2))
  }

  /** largest-overlap assignment: per target, the source with max shared area
   * (ties: smaller source key — deterministic). */
  def largestOverlap(targets: Seq[Keyed], sources: Seq[Keyed]): Seq[(Long, Long, Double)] =
    overlapAreas(targets, sources)
      .groupBy(_._1)
      .map { case (t, rows) =>
        val best = rows.minBy(r => (-r._3, r._2))
        (t, best._2, best._3)
      }.toSeq.sortBy(_._1)

  /** Extensive interpolation: target value = Σ_s v(s) · overlap(t,s)/area(s)
   * (a source's quantity is distributed over its own area). */
  def interpolate(targets: Seq[Keyed], sources: Seq[Keyed], values: Map[Long, Double]): Seq[(Long, Double)] = {
    val srcArea = sources.map { case (k, shape) =>
      k -> math.abs(Overlay.layerArea(shape))
    }.toMap
    overlapAreas(targets, sources)
      .groupBy(_._1)
      .map { case (t, rows) =>
        val v = rows.sortBy(_._2).map { case (_, s, a) =>
          values.getOrElse(s, 0.0) * (a / srcArea(s))
        }.sum
        (t, v)
      }.toSeq.sortBy(_._1)
  }

  /** DataFrame wrapper (kernel runs per co-located component; here driver-side
   * since join layers are broadcast-scale). */
  def overlapDf(spark: SparkSession, targets: Seq[Keyed], sources: Seq[Keyed]): DataFrame = {
    import spark.implicits._
    overlapAreas(targets, sources).toDF("t_key", "s_key", "shared_area")
  }
}
