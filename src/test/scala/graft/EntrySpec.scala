package graft

class EntrySpec extends SparkSuite {

  test("entry: flagship image spatial join returns per-polygon stats") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0, "driver smoke check: rows > 0")
    assert(rows.forall(_.getLong(1) > 0)) // n_images
    assert(df.columns.toSeq == Seq("poly_key", "n_images", "n_cells", "sample_caption"))
  }

  test("every query key has either an oracle or a documented rows-only check") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os.diff(qs)}")
    // all queries run on sf0.001 and are well-formed (schema resolvable)
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
