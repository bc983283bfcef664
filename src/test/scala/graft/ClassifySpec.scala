package graft

import org.apache.spark.sql.functions._

import graft.operators.Classify

class ClassifySpec extends SparkSuite {

  import spark.implicits._

  test("fastStringHash matches the reference's string-hash (values from JS)") {
    // expected values computed by running the reference algorithm in node:
    //   hash = 5381; while (i > 0) hash = (hash * 33) ^ str.charCodeAt(--i)
    assert(Classify.fastStringHash("a") == 177604L)
    assert(Classify.fastStringHash("hello") == 181380007L)
    assert(Classify.fastStringHash("Zürich") == 1583526355L)
    assert(Classify.fastStringHash("category-42") == 1747870046L)
    assert(Classify.fastStringHash("") == 5381L)
    assert(Classify.fastStringHash("12345678901234567890") == 1156245509L)
  }

  test("quantile breaks follow ascending[floor(i*n/numRanges)] exactly") {
    // 10 values, 4 classes -> breaks at ranks floor(2.5)=2, floor(5)=5, floor(7.5)=7
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val breaks = Classify.quantileBreaks(spark, df, "v", numBreaks = 3)
    val ascending = vals.sorted
    assert(breaks == Seq(ascending(2), ascending(5), ascending(7)))
  }

  test("classId counts breaks <= value, null -> -1") {
    val df = Seq[(Int, java.lang.Double)]((1, 0.5), (2, 1.0), (3, 2.5), (4, null))
      .toDF("id", "v")
    val got = df.select($"id", Classify.classId($"v", Seq(1.0, 2.0)).as("c"))
      .orderBy("id").as[(Int, Int)].collect().toSeq
    // 0.5 -> 0; 1.0 -> 1 (val >= break advances); 2.5 -> 2; null -> -1
    assert(got == Seq((1, 0), (2, 1), (3, 2), (4, -1)))
  }

  test("hybrid breaks: quantile outer, equal-interval inner") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val b = Classify.hybridBreaks(spark, df, "v", numBreaks = 4)
    assert(b.size == 4)
    // outer breaks are data values at quantile ranks: floor(100/5)=20 -> 21.0,
    // floor(4*20)=80 -> 81.0
    assert(b.head == 21.0 && b.last == 81.0)
    // inner: equal-interval over [21, 81): min 21, max 80 -> 2 breaks
    val inner = Classify.equalIntervalBreaksOf(21.0, 80.0, 2)
    assert(b(1) == inner.head && b(2) == inner.last)
  }

  test("colorizers: sequential ramp, categorical with other, random hash") {
    val df = Seq((1, 10.0, "x"), (2, 55.0, "y"), (3, 99.0, null))
      .toDF("id", "v", "cat")
    val rows = df.select($"id",
        Classify.colorize($"v", Seq(40.0, 80.0), Seq("lo", "mid", "hi")).as("c"),
        Classify.colorizeCategorical($"cat", Seq("x"), Seq("cx"), otherColor = "other").as("k"),
        Classify.colorizeRandom($"cat", Seq("r0", "r1", "r2")).as("r"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "lo" && rows(1).getString(1) == "mid" && rows(2).getString(1) == "hi")
    assert(rows(0).getString(2) == "cx" && rows(1).getString(2) == "other" && rows(2).isNullAt(2))
    assert(rows(0).getString(3) == "r" + (Classify.fastStringHash("x") % 3))
    assert(rows(2).isNullAt(3))
  }
}
