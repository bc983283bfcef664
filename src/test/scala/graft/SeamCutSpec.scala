package graft

import graft.geom.Crs
import graft.operators.SphericalClip

/** Polyhedral seam cutting: paths split at face/layout-piece boundaries so
 * projected parts never jump across the unfolded sheet. */
class SeamCutSpec extends SparkSuite {

  private def densePath(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
                        n: Int): Array[Double] = {
    val flat = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i <= n) {
      val t = i.toDouble / n
      flat(i * 2) = lon1 + (lon2 - lon1) * t
      flat(i * 2 + 1) = lat1 + (lat2 - lat1) * t
      i += 1
    }
    flat
  }

  test("cut parts are region-uniform and cover the path; raw projection jumps") {
    for (projName <- Seq("dymaxion", "cahill_keyes", "markley", "narukawa2022")) {
      val proj = Crs.fromProj4(projName)
      val spec = Crs.clipSpec(proj)
      val region = spec match {
        case Crs.CutAtFaceSeams(r) => r
        case other => fail(s"$projName clipSpec should be CutAtFaceSeams, got $other")
      }
      // a long transpacific great-chord path definitely crosses seams
      val path = densePath(-120, -40, 150, 55, 400)
      val parts = SphericalClip.cutAtFaceSeams(path, region)
      assert(parts.length >= 2, s"$projName: expected seam cuts, got ${parts.length} part")

      // each part is region-uniform at EVERY vertex (boundary vertices are
      // emitted strictly inside their part's region)
      parts.foreach { part =>
        val r0 = region(part(0), part(1))
        var i = 2
        while (i < part.length) {
          assert(region(part(i), part(i + 1)) == r0,
            s"$projName: vertex region ${region(part(i), part(i + 1))} != $r0 within a part")
          i += 2
        }
      }

      // projecting each part produces NO large jumps, while the raw path does
      def maxJump(flat: Array[Double]): Double = {
        var worst = 0.0
        var i = 2
        while (i < flat.length) {
          val (x1, y1) = proj.forward(flat(i - 2), flat(i - 1))
          val (x2, y2) = proj.forward(flat(i), flat(i + 1))
          worst = math.max(worst, math.hypot(x2 - x1, y2 - y1))
          i += 2
        }
        worst
      }
      val rawJump = maxJump(path)
      val cutJump = parts.map(maxJump).max
      assert(rawJump > 5 * cutJump,
        s"$projName: raw max jump $rawJump vs cut $cutJump — cutting should remove the sheet jump")
      assert(cutJump < 1000000.0, s"$projName: residual jump $cutJump m inside a part")

      // endpoints survive; each cut adds one closing + one opening vertex
      assert(parts.head(0) == path(0) && parts.head(1) == path(1))
      assert(parts.last(parts.last.length - 2) == path(path.length - 2))
      val totalVerts = parts.map(_.length / 2).sum
      assert(totalVerts == path.length / 2 + 2 * (parts.length - 1))
    }
  }

  test("prepare() explodes seam-cut parts per path id") {
    import spark.implicits._
    val proj = Crs.fromProj4("dymaxion").asInstanceOf[Crs.DymaxionProj]
    val paths = Seq(
      (1L, densePath(-120, -40, 150, 55, 200).toSeq),
      (2L, densePath(0, 40, 5, 45, 10).toSeq) // short, single-face
    ).toDF("pid", "path")
    val out = SphericalClip.prepare(paths, "pid", "path", Crs.clipSpec(proj))
      .collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).length >= 2, "long path should split")
    assert(byId(2L).length >= 1)
    // parts of one id carry distinct part indices 0..n-1
    assert(byId(1L).map(_.getInt(1)).sorted.toSeq == (0 until byId(1L).length))
  }
}
