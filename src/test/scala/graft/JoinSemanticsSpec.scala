package graft

import graft.operators.JoinOp

/**
 * Semantic parity cases ported from the reference's own test suite
 * (`/root/reference/test/join-test.mjs`) — same inputs, same expected outputs.
 */
class JoinSemanticsSpec extends SparkSuite {

  import spark.implicits._

  test("self join with calc n=count() (join-test.mjs:16-21)") {
    // 'type\na\nb\na\nb\nb' -join data keys=type,type calc="n = count()"
    // expected: 'type,n\na,2\nb,3\na,2\nb,3\nb,3'
    val data = Seq("a", "b", "a", "b", "b").zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("row", "type")
    val counts = data.groupBy($"type").count().withColumnRenamed("count", "n")
    val out = JoinOp.join(data, counts, "type", "type").joined
      .orderBy("row").select("type", "n").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 2L), ("b", 3L), ("a", 2L), ("b", 3L), ("b", 3L)))
  }

  test("join two tables with duplication flag (join-test.mjs:23-31)") {
    // a: 'id,name\n1,foo'; b: 'key,score\n1,100\n1,200\n1,300'
    // expected: 'id,name,score\n1,foo,100\n1,foo,200\n1,foo,300'
    val a = Seq((1, "foo")).toDF("id", "name")
    val b = Seq((1, 100), (1, 200), (1, 300)).toDF("key", "score")
    val out = JoinOp.join(a, b, "id", "key", fields = Seq("score"), duplication = true)
      .joined.orderBy("score")
      .select("id", "name", "score").as[(Int, String, Int)].collect().toSeq
    assert(out == Seq((1, "foo", 100), (1, "foo", 200), (1, "foo", 300)))
  }

  test("keep-first collision: only the first matching source row is copied") {
    // (join-tables.mjs:106-115 semantics: collisions keep first + warn)
    val a = Seq((1, "t1"), (2, "t2")).toDF("id", "name")
    val b = Seq((1, 100, 0L), (1, 200, 1L), (2, 300, 2L)).toDF("key", "score", "ord")
    val out = JoinOp.join(a, b, "id", "key", fields = Seq("score"), orderCol = Some("ord"))
      .joined.orderBy("id").select("id", "score").as[(Int, Int)].collect().toSeq
    assert(out == Seq((1, 100), (2, 300)))
  }

  test("sum-fields accumulates over all matches; unmatched keeps nulls") {
    val a = Seq((1, "x"), (9, "y")).toDF("id", "name")
    val b = Seq((1, 10.0), (1, 32.0)).toDF("key", "v")
    val r = JoinOp.join(a, b, "id", "key", fields = Seq("v"), sumFields = Seq("v"))
    val rows = r.joined.orderBy("id")
      .select($"id", $"v", $"sum_v").collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getDouble(1) == 10.0 && rows(0).getDouble(2) == 42.0)
    assert(rows(1).getInt(0) == 9 && rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("unmatched / unjoined side outputs (join-tables.mjs:166-179)") {
    val a = Seq((1, "x"), (9, "y")).toDF("id", "name")
    val b = Seq((1, 10), (7, 20)).toDF("key", "v")
    val r = JoinOp.join(a, b, "id", "key", fields = Seq("v"))
    assert(r.unmatched.select("id").as[Int].collect().toSeq == Seq(9))
    assert(r.unjoined.select("key").as[Int].collect().toSeq == Seq(7))
  }

  test("keep-first without orderCol is deterministic across partitionings") {
    // colliding keys, no explicit order: winner = smallest full tuple, so the
    // output must be byte-identical at any parallelism (the round-1
    // monotonically_increasing_id default depended on partition layout)
    val a = Seq((1, "t1"), (2, "t2"), (3, "t3")).toDF("id", "name")
    val b = Seq((1, 300, "z"), (1, 100, "y"), (1, 200, "x"),
      (2, 50, "q"), (2, 50, "p")).toDF("key", "score", "tag")
    def run(parts: Int) =
      JoinOp.join(a, b.repartition(parts), "id", "key", fields = Seq("score", "tag"))
        .joined.orderBy("id").select("id", "score", "tag").collect().toSeq
    val r2 = run(2)
    val r17 = run(17)
    assert(r2 == r17)
    // and the winner is the smallest (score, tag) tuple per key
    assert(r2.map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))) ==
      Seq((1, 100), (2, 50), (3, -1)))
  }

  test("where= filters which source rows may match (join-filter.mjs:9-29)") {
    val a = Seq((1, "t1"), (2, "t2")).toDF("id", "name")
    val b = Seq((1, 100), (1, 5), (2, 7)).toDF("key", "score")
    val r = JoinOp.join(a, b, "id", "key", fields = Seq("score"),
      where = Some(org.apache.spark.sql.functions.col("score") < 50))
    val out = r.joined.orderBy("id").select("id", "score").as[(Int, Int)].collect().toSeq
    assert(out == Seq((1, 5), (2, 7)))
    // rows excluded by where= don't count as joinable for side outputs either
    assert(r.unjoined.count() == 0)
  }

  test("modeWithMargin: fuzzy-join mode semantics with deterministic ties") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "d")).toDF("g", "v")
    val out = JoinOp.modeWithMargin(df, "g", "v")
      .orderBy("g").select("g", "mode_value", "mode_count", "margin")
      .as[(Int, String, Long, Long)].collect().toSeq
    // group 2 ties c/d -> smaller value wins, margin 0
    assert(out == Seq((1, "a", 2L, 1L), (2, "c", 1L, 0L)))
  }
}
