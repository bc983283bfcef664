package graft

import graft.functions.FeatureExprs

class FeatureExprsSpec extends SparkSuite {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("ring getters: shoelace area, perimeter, compactness, bbox") {
    // CCW unit-ish rect 3x2 at (1,1) and a triangle
    val rect = Seq(1.0, 1.0, 4.0, 1.0, 4.0, 3.0, 1.0, 3.0, 1.0, 1.0)
    val tri = Seq(0.0, 0.0, 4.0, 0.0, 0.0, 3.0, 0.0, 0.0)
    val df = Seq((1L, rect), (2L, tri)).toDF("id", "ring")
    val out = df.select(col("id"),
        FeatureExprs.ringSignedArea(col("ring")).as("a"),
        FeatureExprs.ringPerimeter(col("ring")).as("p"),
        FeatureExprs.compactness(col("ring")).as("c"),
        FeatureExprs.bboxWidth(col("ring")).as("w"),
        FeatureExprs.bboxHeight(col("ring")).as("h"),
        FeatureExprs.bboxContainsPoint(col("ring"), lit(2.0), lit(2.0)).as("in2"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 6.0 && out(0).getDouble(2) == 10.0)
    assert(math.abs(out(0).getDouble(3) - 6.0 * math.Pi * 4 / 100.0) < 1e-12)
    assert(out(0).getDouble(4) == 3.0 && out(0).getDouble(5) == 2.0 && out(0).getBoolean(6))
    assert(out(1).getDouble(1) == 6.0 && out(1).getDouble(2) == 12.0) // 4+5+3
    assert(out(1).getBoolean(6)) // (2,2) is inside the triangle's bbox [0,4]x[0,3]
  }

  test("round / format_dms / parse_dms match the reference semantics") {
    // JS Math.round ≡ floor(v·k + 0.5): 2.345·100 is stored just ABOVE the
    // midpoint (234.50000000000003), so both signs land on |2.35|
    val r = spark.range(1).select(
      FeatureExprs.roundTo(lit(-2.345), 2).as("a"),
      FeatureExprs.roundTo(lit(2.345), 2).as("b"),
      FeatureExprs.roundTo(lit(2.346), 2).as("c")).head()
    assert(r.getDouble(0) == -2.35 && r.getDouble(1) == 2.35 && r.getDouble(2) == 2.35)
    assert(FeatureExprs.formatDmsDefault(-12.5) == "-12°30'0.000")
    assert(FeatureExprs.formatDmsDefault(10.2585) == "10°15'30.600")
    assert(FeatureExprs.parseDmsDefault("-12°30'0.000") == -12.5)
    assert(math.abs(FeatureExprs.parseDmsDefault("10°15'30.600") - 10.2585) < 1e-12)
    assert(FeatureExprs.parseDmsDefault("90d30m") == 90.5)
    assert(FeatureExprs.parseDmsDefault("12.5W") == -12.5)
    assert(FeatureExprs.parseDmsDefault("garbage 123").isNaN)
    // format -> parse round trip at milliarcsecond resolution
    Seq(0.0, -179.999999, 45.123456, 89.9999).foreach { v =>
      val back = FeatureExprs.parseDmsDefault(FeatureExprs.formatDmsDefault(v))
      assert(math.abs(back - v) < 0.5e-6 + 1e-12, s"$v -> $back")
    }
  }

  test("blend and int_median helpers") {
    assert(FeatureExprs.blendHex(Seq("#000000", "#ffffff"), Seq(1.0, 1.0)) == "#808080")
    assert(FeatureExprs.blendHex(Seq("#ff0000", "#0000ff"), Seq(3.0, 1.0)) == "#bf0040")
    assert(FeatureExprs.blendHex(Seq("#ff0000"), Seq(0.0)) == "#eee")
    // int_median: counts [2,4,2] over breaks [0,10,20,30]: total 8, median idx 4,
    // falls in the second bin: lower=2, upper=6 -> t=(4-2)/4=0.5 -> 15
    assert(FeatureExprs.intMedian(Seq(2.0, 4.0, 2.0), Seq(0.0, 10.0, 20.0, 30.0)) == 15.0)
    assert(FeatureExprs.intMedian(Seq(1.0), Seq(0.0)) == null)
  }
}
