package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Geom, Simplify}

/**
 * Spherical (3D) simplification — the reference's default for lon/lat data.
 * Planar lon/lat Visvalingam mis-weights near the poles and across the
 * antimeridian; the 3D variant measures true chord geometry, which these
 * tests pin down with cases where the two disagree dramatically.
 */
class SphericalSimplifySpec extends AnyFunSuite {

  test("antimeridian zigzag: spherical thresholds uniform, planar wrap-distorted") {
    // a uniform zigzag crossing the antimeridian: geometry identical at every
    // vertex ON THE SPHERE, but planar lon/lat sees a 355-degree jump
    val lon = Array(170.0, 175.0, 180.0, -175.0, -170.0)
    val lat = Array(60.0, 61.0, 60.0, 61.0, 60.0)
    val sph = Simplify.sphericalThresholds(lon, lat, Simplify.Visvalingam)
    val planar = Simplify.thresholds(lon, lat, Simplify.Visvalingam)
    val sphI = sph.slice(1, 4)
    val plaI = planar.slice(1, 4)
    assert(sphI.max / sphI.min < 2.0, s"spherical should be uniform: ${sphI.toSeq}")
    assert(plaI.max / plaI.min > 4.0, s"planar should blow up at the wrap: ${plaI.toSeq}")
    assert(sph.head == Double.PositiveInfinity && sph.last == Double.PositiveInfinity)
  }

  test("near-pole triangle: spherical metric measures ground meters") {
    // at 89.9N a 1-degree lon step is ~195 m on the ground, but 1 planar unit
    val lon = Array(0.0, 1.0, 2.0)
    val lat = Array(89.9, 89.95, 89.9)
    val sph = Simplify.sphericalThresholds(lon, lat, Simplify.Visvalingam)
    // sqrt(area)*0.65 of a triangle with ~200 m sides is well under 1 km
    assert(sph(1) < 1000.0, s"sph(1) = ${sph(1)}")
    // the same triangle in planar lon/lat units scales to ~60 km equivalent
    val eq = Simplify.sphericalThresholds(Array(0.0, 1.0, 2.0), Array(0.0, 0.05, 0.0),
      Simplify.Visvalingam)
    assert(eq(1) > 10 * sph(1), "equator triangle must dwarf the polar one in meters")
  }

  test("meridian arc: DP threshold equals the analytic chord sagitta") {
    // 3 points on a meridian: the middle sits at the arc midpoint of a
    // 40-degree great-circle chord; its distance to the chord LINE is the
    // sagitta R(1 - cos 20°) — an exact closed form for the 3D kernel
    val lon = Array.fill(3)(45.0)
    val lat = Array(0.0, 20.0, 40.0)
    val sph = Simplify.sphericalThresholds(lon, lat, Simplify.DouglasPeucker)
    val sagitta = 6378137.0 * (1.0 - math.cos(20.0 * math.Pi / 180.0))
    assert(math.abs(sph(1) - sagitta) / sagitta < 1e-9, s"got ${sph(1)}, want $sagitta")
  }

  test("world-edge protection locks frame vertices to the max threshold") {
    val lon = Array(170.0, 175.0, 180.0, -175.0, -170.0)
    val lat = Array.fill(5)(60.0)
    val kk = Simplify.sphericalThresholds(lon, lat, Simplify.Visvalingam)
    val before = kk(2)
    val maxFinite = kk.filter(_ < Double.PositiveInfinity).max
    val locked = Simplify.protectWorldEdges(lon, lat, kk.clone())
    assert(locked(2) == maxFinite && locked(2) >= before)
    // rounding-error coordinates are still caught (the NE fixtures have them)
    val lon2 = Array(0.0, -179.99999999999994, 10.0)
    val lat2 = Array(0.0, 5.0, 10.0)
    val kk2 = Simplify.sphericalThresholds(lon2, lat2, Simplify.Visvalingam)
    val locked2 = Simplify.protectWorldEdges(lon2, lat2, kk2.clone())
    assert(locked2(1) == kk2.filter(_ < Double.PositiveInfinity).max)
  }

  test("monotonicity: retained count decreases as pct drops; 3D clamp holds") {
    // a noisy closed ring around (10, 50)
    val n = 60
    val lon = Array.tabulate(n + 1) { i =>
      val a = 2 * math.Pi * (i % n) / n
      10.0 + (1.0 + 0.2 * math.sin(5 * a)) * math.cos(a)
    }
    val lat = Array.tabulate(n + 1) { i =>
      val a = 2 * math.Pi * (i % n) / n
      50.0 + (1.0 + 0.2 * math.sin(5 * a)) * math.sin(a)
    }
    val kk = Simplify.sphericalThresholds(lon, lat, Simplify.WeightedVisvalingam)
    def retained(interval: Double) = kk.count(_ >= interval)
    val counts = Seq(0.0, 1000.0, 5000.0, 20000.0, 100000.0).map(retained)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // thresholds of successively removed vertices are non-decreasing after the
    // monotonicity clamp: sorting by threshold = removal order
    val interior = kk.filter(_ < Double.PositiveInfinity)
    assert(interior.min >= 0.0)
  }

  test("keep-shapes: a ring that would vanish keeps its top vertices") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // tiny square ring (collapses at any coarse interval) + a large ring
    val tiny = Array(0.0, 0.0, 0.001, 0.0, 0.001, 0.001, 0.0, 0.001, 0.0, 0.0)
    val big: Array[Double] = Array.tabulate(41) { i =>
      val a = 2 * math.Pi * (i % 40) / 40.0
      Seq(20.0 + 10.0 * math.cos(a), 20.0 + 10.0 * math.sin(a))
    }.flatten
    val df = Seq((1L, tiny.toSeq), (2L, big.toSeq)).toDF("id", "ring")
    val out = graft.operators.SimplifyOp
      .simplifySpherical(spark, df, "ring", pct = 0.05, keepShapes = true)
      .select("id", "n_after").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) >= 4, s"tiny ring collapsed: ${out(1L)}")
    assert(out(2L) >= 4)
    val without = graft.operators.SimplifyOp
      .simplifySpherical(spark, df, "ring", pct = 0.05, keepShapes = false)
      .select("id", "n_after").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(without(1L) < out(1L), "keep-shapes must restore vertices the filter dropped")
  }

  test("3D metric identities: area and cosine match hand values") {
    // right triangle in the z=0 plane: legs 3 and 4 -> area 6, cos at b = 0
    assert(Geom.triangleArea3D(3, 0, 0, 0, 0, 0, 0, 4, 0) == 6.0)
    assert(Geom.cosine3D(3, 0, 0, 0, 0, 0, 0, 4, 0) == 0.0)
    // same triangle rotated into z: area invariant
    assert(math.abs(Geom.triangleArea3D(0, 0, 3, 0, 0, 0, 0, 4, 0) - 6.0) < 1e-12)
    val p = new Array[Double](3)
    Geom.lngLatToXYZ(0.0, 0.0, p)
    assert(p(0) == 6378137.0 && p(1) == 0.0 && math.abs(p(2)) < 1e-9)
    Geom.lngLatToXYZ(0.0, 90.0, p)
    assert(math.abs(p(2) - 6378137.0) < 1e-9)
  }
}
