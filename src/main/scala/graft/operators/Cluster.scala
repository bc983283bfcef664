package graft.operators

import scala.collection.mutable

/**
 * Greedy agglomerative clustering of shapes by centroid distance — the
 * reference's `-cluster` (`/root/reference/src/commands/mapshaper-cluster.mjs:16-40`):
 * repeatedly merge the closest pair of clusters until the target count (or a
 * max-width constraint) is reached. Driver-side over (id, cx, cy) tuples —
 * the cluster SOURCE data (polygon centroids) is small by design; the
 * expensive part (centroids of 10^12 rows) is the distributed groupBy that
 * produces the input.
 */
object Cluster {

  /** Agglomerate to `k` clusters; returns id -> clusterId (deterministic:
   * ties break on smallest member ids). */
  def greedy(items: Seq[(Long, Double, Double)], k: Int, maxDist: Double = Double.MaxValue): Map[Long, Int] = {
    val n = items.size
    if (n == 0) return Map.empty
    // cluster state: member ids, centroid, size
    val members = mutable.ArrayBuffer(items.map(i => mutable.ArrayBuffer(i._1)): _*)
    val cx = mutable.ArrayBuffer(items.map(_._2): _*)
    val cy = mutable.ArrayBuffer(items.map(_._3): _*)
    val alive = mutable.ArrayBuffer.fill(n)(true)
    var nAlive = n

    def dist2(i: Int, j: Int): Double = {
      val dx = cx(i) - cx(j); val dy = cy(i) - cy(j)
      dx * dx + dy * dy
    }

    while (nAlive > k) {
      // find the closest alive pair (deterministic scan order)
      var bi = -1; var bj = -1
      var bd = Double.MaxValue
      var i = 0
      while (i < members.length) {
        if (alive(i)) {
          var j = i + 1
          while (j < members.length) {
            if (alive(j)) {
              val d = dist2(i, j)
              if (d < bd) { bd = d; bi = i; bj = j }
            }
            j += 1
          }
        }
        i += 1
      }
      if (bi < 0 || bd > maxDist * maxDist) return assignment(members, alive)
      // merge j into i (weighted centroid)
      val si = members(bi).size.toDouble
      val sj = members(bj).size.toDouble
      cx(bi) = (cx(bi) * si + cx(bj) * sj) / (si + sj)
      cy(bi) = (cy(bi) * si + cy(bj) * sj) / (si + sj)
      members(bi) ++= members(bj)
      alive(bj) = false
      nAlive -= 1
    }
    assignment(members, alive)
  }

  private def assignment(members: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]],
                         alive: mutable.ArrayBuffer[Boolean]): Map[Long, Int] = {
    val out = Map.newBuilder[Long, Int]
    var cid = 0
    var i = 0
    while (i < members.length) {
      if (alive(i)) {
        members(i).foreach(m => out += (m -> cid))
        cid += 1
      }
      i += 1
    }
    out.result()
  }
}
