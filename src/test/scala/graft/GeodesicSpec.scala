package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Crs

/** Ellipsoidal geodesic (Vincenty) + ellipsoidal AEQD invariants. */
class GeodesicSpec extends AnyFunSuite {

  private val A = Crs.A
  private val B = Crs.B

  test("equator is a geodesic: direct east along it is an exact arc of radius a") {
    // 1 degree of equatorial arc
    val s = A * math.Pi / 180.0
    val (lon2, lat2, azi2) = Crs.geodesicDirect(0.0, 10.0, 90.0, s)
    assert(math.abs(lon2 - 11.0) < 1e-9, s"lon2=$lon2")
    assert(math.abs(lat2) < 1e-9)
    assert(math.abs(azi2 - 90.0) < 1e-9)
  }

  test("meridian quarter arc: pole distance matches the series meridian length") {
    // quarter meridian of WGS84 = 10 001 965.729 m (published constant)
    val quarter = 10001965.729
    val (lon2, lat2, _) = Crs.geodesicDirect(0.0, 25.0, 0.0, quarter)
    assert(math.abs(lat2 - 90.0) < 1e-5, s"lat2=$lat2")
    assert(math.abs(lon2 - 25.0) < 1e-4 || math.abs(lat2 - 90.0) < 1e-6)
  }

  test("direct/inverse round-trip: random azimuths and distances agree to mm") {
    val rng = new graft.tables.SplitMix64(77)
    for (_ <- 0 until 50) {
      val lat1 = rng.nextDouble() * 140 - 70
      val lon1 = rng.nextDouble() * 360 - 180
      val azi = rng.nextDouble() * 360
      val s = rng.nextDouble() * 5e6 + 1000
      val (lon2, lat2, _) = Crs.geodesicDirect(lat1, lon1, azi, s)
      val (s2, azi1) = Crs.geodesicInverse(lat1, lon1, lat2, lon2)
      assert(math.abs(s2 - s) < 1e-3, s"dist: want $s got $s2")
      val dAzi = math.abs(((azi1 - azi) % 360 + 540) % 360 - 180)
      assert(dAzi < 1e-6, s"azi: want $azi got $azi1")
    }
  }

  test("ellipsoid flattening is visible: 1 degree of meridian arc differs pole vs equator") {
    // meridian radius of curvature is smaller at the equator than at the pole
    val (_, latEq, _) = Crs.geodesicDirect(0.0, 0.0, 0.0, 110000.0)
    val (_, latHi, _) = Crs.geodesicDirect(80.0, 0.0, 0.0, 110000.0)
    val dEq = latEq - 0.0
    val dHi = latHi - 80.0
    assert(dEq > dHi, s"equatorial degree should span more lat: $dEq vs $dHi")
    // and both differ measurably from the spherical answer
    val sphere = 110000.0 / 6371008.8 * Crs.R2D
    assert(math.abs(dEq - sphere) > 1e-4)
  }

  test("ellipsoidal AEQD: center maps to origin, distances from center are geodesic") {
    val p = Crs.AeqdGeodesic(40.0, -100.0)
    assert(p.forward(-100.0, 40.0) == ((0.0, 0.0)))
    val (x, y) = p.forward(-90.0, 45.0)
    val (s, _) = Crs.geodesicInverse(40.0, -100.0, 45.0, -90.0)
    assert(math.abs(math.hypot(x, y) - s) < 1e-6)
    // inverse recovers the lon/lat
    val (lon, lat) = p.inverse(x, y)
    assert(math.abs(lon - (-90.0)) < 1e-9 && math.abs(lat - 45.0) < 1e-9)
  }

  test("aeqd proj-string selects spherical vs ellipsoidal variants") {
    assert(Crs.fromProj4("+proj=aeqd +lat_0=40 +lon_0=-100")
      .isInstanceOf[Crs.Aeqd])
    assert(Crs.fromProj4("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84")
      .isInstanceOf[Crs.AeqdGeodesic])
    assert(Crs.fromProj4("+proj=aeqd +lat_0=40 +lon_0=-100 +datum=WGS84")
      .isInstanceOf[Crs.AeqdGeodesic])
    assert(Crs.fromProj4("+proj=aeqd +lat_0=40 +lon_0=-100 +R=6371000")
      .isInstanceOf[Crs.Aeqd])
  }

  test("ellipsoidal point buffer ring: all vertices at geodesic radius, ring closes") {
    val ring = graft.operators.Buffer.geodesicPointBufferRingEllipsoidal(
      -100.0, 40.0, 50000.0, nSeg = 16)
    assert(ring.length == 34)
    assert(ring(0) == ring(32) && ring(1) == ring(33))
    for (i <- 0 until 16) {
      val (s, _) = Crs.geodesicInverse(40.0, -100.0, ring(i * 2 + 1), ring(i * 2))
      assert(math.abs(s - 50000.0) < 1e-4, s"vertex $i at $s m")
    }
  }
}
