package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FlatGeobuf

/** Reads the reference's own .fgb fixtures (test/data/flatgeobuf/). */
class FlatGeobufSpec extends AnyFunSuite {

  test("poly00.fgb: polygon layer with a 'poly' column, coords inside envelope") {
    val layer = FlatGeobuf.read("/root/reference/test/data/flatgeobuf/poly00.fgb")
    assert(layer.geometryType == FlatGeobuf.GPolygon)
    assert(layer.columns.map(_.name) == Seq("AREA", "EAS_ID", "PRFEDEA"))
    assert(layer.features.nonEmpty)
    val env = layer.envelope
    assert(env.length == 4)
    layer.features.foreach { f =>
      assert(f.parts.nonEmpty)
      f.parts.foreach { r =>
        var i = 0
        while (i < r.length) {
          assert(r(i) >= env(0) - 1e-6 && r(i) <= env(2) + 1e-6, s"x ${r(i)}")
          assert(r(i + 1) >= env(1) - 1e-6 && r(i + 1) <= env(3) + 1e-6, s"y ${r(i + 1)}")
          i += 2
        }
        // polygon rings are closed
        assert(r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
      }
      assert(f.props.contains("AREA") && f.props.contains("EAS_ID"))
    }
  }

  test("countries.fgb: many multipolygon features with id/name properties") {
    val layer = FlatGeobuf.read("/root/reference/test/data/flatgeobuf/countries.fgb")
    assert(layer.features.length > 100)
    val names = layer.columns.map(_.name)
    assert(names.nonEmpty)
    // every feature parses geometry and all its rings are closed
    layer.features.foreach { f =>
      assert(f.parts.nonEmpty)
      f.parts.foreach { r =>
        assert(r.length >= 8)
        assert(r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
      }
    }
    // property blob decoded for the declared columns
    val withProps = layer.features.count(_.props.nonEmpty)
    assert(withProps == layer.features.length)
  }

  test("empty.fgb parses with zero features") {
    val layer = FlatGeobuf.read("/root/reference/test/data/flatgeobuf/empty.fgb")
    assert(layer.features.isEmpty)
  }
}
