package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.DetailFilter

class DetailFilterSpec extends AnyFunSuite {

  test("thin needle is sliced off; smooth stretches keep full detail") {
    // straight baseline with a tall thin zigzag needle in the middle
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 4.05, 4.1, 4.15, 4.2, 5.0, 6.0, 7.0, 8.0)
    val ys = Array(0.0, 0.0, 0.0, 0.0, 0.0, 2.0, 0.1, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val (fx, fy) = DetailFilter.filter(xs, ys, distance = 1.0)
    // endpoints preserved
    assert(fx.head == 0.0 && fx.last == 8.0)
    // the needle (y=2 spikes over a 0.2-wide base, within the 12*D merge
    // window) is gone
    assert(fy.forall(_ < 1.0), fy.mkString(","))
    // the smooth baseline vertices all survive (no thinning outside the cut):
    // every original y=0 vertex is still present
    val kept = fx.zip(fy).toSet
    Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).foreach { x =>
      assert(kept.contains((x, 0.0)), s"baseline vertex $x dropped")
    }
  }

  test("gentle curve below tortuosity threshold is left untouched") {
    val n = 20
    val xs = Array.tabulate(n)(i => i.toDouble * 0.3)
    val ys = Array.tabulate(n)(i => math.sin(i * 0.3) * 0.2)
    val (fx, _) = DetailFilter.filter(xs, ys, distance = 2.0)
    assert(fx.length == n) // everything restored: tortuosity ~1 < 4
  }

  test("roundness gate protects a substantial round loop") {
    // half-circle excursion of radius 2 on a baseline, detail distance 1:
    // tortuosity = pi*r / (2r) ~ 1.57 < 4 anyway, so make it deeper: use a
    // near-closed loop (chord 0.2, radius 2) -> tortuosity >> 4, but
    // area/perimeter = r/2 = 1 >= 0.2 * 1 -> protected
    val m = 30
    val loopX = Array.tabulate(m)(i => 5.0 + 2.0 * math.cos(math.Pi * (1 - i.toDouble / (m - 1)) * 1.9 + 0.1))
    val loopY = Array.tabulate(m)(i => 2.0 * math.sin(math.Pi * (1 - i.toDouble / (m - 1)) * 1.9 + 0.1))
    val xs = Array(0.0, 2.0) ++ loopX ++ Array(8.0, 10.0)
    val ys = Array(0.0, 0.0) ++ loopY ++ Array(0.0, 0.0)
    val (_, fy) = DetailFilter.filter(xs, ys, distance = 1.0)
    // the loop's far side (y ~ +-2) survives
    assert(fy.exists(y => math.abs(y) > 1.5))
  }
}
