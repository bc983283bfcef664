package graft

import graft.operators.DataFill

class DataFillSpec extends SparkSuite {

  import spark.implicits._

  test("data-fill propagates modal neighbor values over the adjacency graph") {
    // chain 1-2-3-4-5; 1 and 5 labeled, middle null
    val features = Seq(
      (1L, "a"), (2L, null), (3L, null), (4L, null), (5L, "b"))
      .toDF("id", "value")
    val adj = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = DataFill.fill(spark, features, adj)
      .orderBy("id").as[(Long, String)].collect().toSeq
    // round 1: 2<-a, 4<-b; round 2: 3 has neighbors a and b -> tie -> 'a'
    assert(out == Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b")))
  }

  test("data-fill leaves unreachable components null and terminates") {
    val features = Seq((1L, "x"), (2L, null), (9L, null)).toDF("id", "value")
    val adj = Seq((1L, 2L)).toDF("a", "b")
    val out = DataFill.fill(spark, features, adj)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "x" && out(1).getString(1) == "x")
    assert(out(2).isNullAt(1)) // id 9 disconnected
  }

  test("weighted fill: the longer shared border wins the vote") {
    // count-voting would tie 'a' vs 'b' (one donor each) and the tie-break
    // would pick 'a'; the 5.0-long border to donor 1 makes 'b' win instead
    val features = Seq((1L, "b"), (3L, null), (5L, "a")).toDF("id", "value")
    val adj = Seq((1L, 3L, 5.0), (3L, 5L, 1.0)).toDF("a", "b", "w")
    val out = DataFill.fillWeighted(spark, features, adj)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "b"), (3L, "b"), (5L, "a")))
  }

  test("weighted fill pools weights across units sharing a donor value set") {
    // two empty units both see donor set {a, b}; individually unit 3 leans
    // 'b' (3.0 vs 2.0) but the pooled group weight favors 'a'
    // (2.0+4.0 > 3.0+0.5), so BOTH get 'a' (the reference's group
    // assignment, data-fill.mjs:57-77); the strong 3-4 border keeps the
    // smoothing pass from second-guessing the group
    val features = Seq((1L, "a"), (2L, "b"), (3L, null), (4L, null))
      .toDF("id", "value")
    val adj = Seq(
      (1L, 3L, 2.0), (2L, 3L, 3.0),
      (1L, 4L, 4.0), (2L, 4L, 0.5), (3L, 4L, 8.0)).toDF("a", "b", "w")
    val out = DataFill.fillWeighted(spark, features, adj)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "a")))
  }

  test("smoothing pass reassigns a filled unit when another border dominates") {
    // chain a-n-n-b: round 1 fills 2<-a, 3<-b; smoothing then flips 2 to 'b'
    // because its border to 3 (now 'b', weight 10) dwarfs its border to 1
    val features = Seq((1L, "a"), (2L, null), (3L, null), (4L, "b"))
      .toDF("id", "value")
    val adj = Seq((1L, 2L, 1.0), (2L, 3L, 10.0), (3L, 4L, 2.0)).toDF("a", "b", "w")
    val out = DataFill.fillWeighted(spark, features, adj)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out(1) == ((2L, "b")) && out(2) == ((3L, "b")))
  }

  test("contiguous: satellite island of a value is cleared and refilled") {
    // line 1..5: value 'a' at 1-2, 'b' at 3-4, satellite 'a' at 5.
    // weight column ranks the 1-2 'a' group (weight 10) over the lone 5
    // (weight 1): 5 is cleared, then refilled from neighbor 4 -> 'b'
    val features = Seq(
      (1L, "a", 10.0), (2L, "a", 10.0), (3L, "b", 1.0), (4L, "b", 1.0), (5L, "a", 1.0))
      .toDF("id", "value", "wt")
    val adj = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0))
      .toDF("a", "b", "w")
    val out = DataFill.fillWeighted(spark, features, adj,
        weightCol = Some("wt"), contiguous = true)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b")))
  }
}
