package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Neighbor-based attribute fill — the reference's `-data-fill`
 * (`/root/reference/src/commands/mapshaper-data-fill.mjs:14`, weighted
 * contagion over the polygon-neighbors graph,
 * `src/polygons/mapshaper-polygon-neighbors.mjs`).
 *
 * Spark form: iterate joins over an adjacency table — each round, every
 * still-null feature adopts the modal value of its already-filled neighbors
 * (ties broken by smallest value — deterministic). The loop runs on the
 * driver; each round is one shuffle-light join + window. Converges in
 * O(graph diameter) rounds.
 */
object DataFill {

  /**
   * @param features  (id, value) — value nullable
   * @param adjacency (a, b) undirected neighbor pairs (both directions or one;
   *                  symmetrized internally)
   * @return (id, value) with nulls filled where reachable
   */
  def fill(spark: SparkSession, features: DataFrame, adjacency: DataFrame,
           idCol: String = "id", valueCol: String = "value",
           maxRounds: Int = 20): DataFrame = {
    // localCheckpoint (not cache): caching truncates execution but NOT
    // Catalyst analysis — 20 rounds of join-on-join otherwise grow a logical
    // tree that makes analysis superlinear (same lesson as the CC loop in
    // OverlayOp.dissolve2Distributed)
    val adj = adjacency.select(col("a"), col("b"))
      .union(adjacency.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var cur = features.select(col(idCol).as("id"), col(valueCol).as("value"))
      .localCheckpoint(true)
    var round = 0
    var remaining = cur.filter(col("value").isNull).count()
    while (remaining > 0 && round < maxRounds) {
      val filledNeighbors = cur.filter(col("value").isNull).select(col("id"))
        .join(adj, col("id") === adj("a"))
        .join(cur.filter(col("value").isNotNull)
          .select(col("id").as("nid"), col("value").as("nval")), col("b") === col("nid"))
        .groupBy(col("id"), col("nval")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("id")).orderBy(col("c").desc, col("nval"))
      val chosen = filledNeighbors
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("id").as("fid"), col("nval"))
      val next = cur.join(chosen, cur("id") === chosen("fid"), "left")
        .select(cur("id"), coalesce(cur("value"), col("nval")).as("value"))
        .localCheckpoint(true) // one materializing job per round (plan reset)
      val nextRemaining = next.filter(col("value").isNull).count()
      if (nextRemaining == remaining) round = maxRounds // no progress: disconnected
      remaining = nextRemaining
      cur.unpersist()
      cur = next
      round += 1
    }
    adj.unpersist()
    cur
  }
}
