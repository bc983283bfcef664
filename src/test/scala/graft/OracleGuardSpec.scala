package graft

import org.apache.spark.sql.types._

class OracleGuardSpec extends SparkSuite {

  private val longCol = StructType(Seq(StructField("n", LongType)))

  test("guard flags a bare integer sum aliased to a BIGINT column") {
    val sql = "SELECT k, sum(v) AS n FROM t GROUP BY k"
    assert(OracleGuard.violations("q", sql, longCol) == Seq("q" -> "n"))
  }

  test("guard accepts a CAST-wrapped sum") {
    val sql = "SELECT k, CAST(sum(v) AS BIGINT) AS n FROM t GROUP BY k"
    assert(OracleGuard.violations("q", sql, longCol).isEmpty)
  }

  test("guard accepts a nested sum rewrapped by an outer cast (layered CTE)") {
    val sql =
      """WITH c AS (SELECT k, sum(v) AS n FROM t GROUP BY k)
        |SELECT k, CAST(n AS BIGINT) AS n FROM c""".stripMargin
    assert(OracleGuard.violations("q", sql, longCol).isEmpty)
  }

  test("guard flags sums with nested function calls (the r3 q_tilerun shape)") {
    val sql = "SELECT g, SUM(coalesce(m.n, 0)) AS n FROM t GROUP BY g"
    assert(OracleGuard.violations("q", sql, longCol) == Seq("q" -> "n"))
    val fixed = "SELECT g, CAST(SUM(coalesce(m.n, 0)) AS BIGINT) AS n FROM t GROUP BY g"
    assert(OracleGuard.violations("q", fixed, longCol).isEmpty)
  }

  test("guard ignores double-typed sums and count aliases") {
    val schema = StructType(Seq(
      StructField("s", DoubleType), StructField("c", LongType)))
    val sql = "SELECT sum(x) AS s, count(*) AS c FROM t"
    assert(OracleGuard.violations("q", sql, schema).isEmpty)
  }

  test("every shipped oracle is HUGEINT-clean against its Spark schema") {
    OracleGuard.check(name =>
      scala.util.Try(SparkEntry.queries(name)(spark, Sf).schema).toOption)
  }
}
