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
}
