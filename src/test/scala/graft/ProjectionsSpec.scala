package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Crs

/** The -projections listing: every advertised id must parse and project. */
class ProjectionsSpec extends AnyFunSuite {

  test("every listed projection id round-trips through the parser and projects") {
    assert(Crs.supportedProjections.nonEmpty)
    Crs.supportedProjections.foreach { case (id, name) =>
      assert(name.nonEmpty)
      val spec = if (id == "utm") s"+proj=$id +zone=33" else s"+proj=$id"
      val p = Crs.fromProj4(spec)
      val (x, y) = p.forward(11.5, 48.1) // inside every projection's domain
      assert(x.isFinite && y.isFinite, s"$id projected to ($x, $y)")
    }
  }

  test("ids are unique and sorted output is stable") {
    val ids = Crs.supportedProjections.map(_._1)
    assert(ids.distinct.length == ids.length)
  }
}
