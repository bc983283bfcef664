package graft.index

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/**
 * One broadcast per (SparkContext, layer) — repeated invocations of the
 * spatial operators over the same layer reuse the broadcast handle instead
 * of re-serializing and re-shipping the SoA blob every call (driver-side
 * serial work billed to every query; same rationale as the frozen bench's
 * own `layerBc` cache). Keys compare by identity: layers are stable
 * singletons (`Synthetic.oracleLayer`, the image layer) or per-query
 * builds that don't recur. Entries live for the JVM's lifetime — bounded
 * by #sessions x #distinct layers, both tiny.
 */
object LayerBroadcasts {
  /** Guard against unbounded growth when a caller builds a fresh layer per
   * invocation (identity keys never hit): past this size, broadcast without
   * caching — correctness unchanged, just no reuse for that call. */
  private val MaxEntries = 64

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkContext, PolygonLayer),
      Broadcast[PolygonLayer]]()

  def of(spark: SparkSession, layer: PolygonLayer): Broadcast[PolygonLayer] = {
    val key = (spark.sparkContext, layer)
    val hit = cache.get(key)
    if (hit != null) hit
    else if (cache.size >= MaxEntries) spark.sparkContext.broadcast(layer)
    else cache.computeIfAbsent(key, k => k._1.broadcast(k._2))
  }
}
