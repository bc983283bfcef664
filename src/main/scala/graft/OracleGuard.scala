package graft

import org.apache.spark.sql.types.{StructType, LongType, IntegerType}

/** Static lint over the DuckDB oracle mirrors: when the Spark result schema
  * says an output column is integral (LongType/IntegerType), its oracle
  * definition must not be a bare `sum(...)` — DuckDB widens integer sums to
  * HUGEINT, which hash-mismatches against Spark's BIGINT even when every
  * value agrees. This trap produced red rows in three consecutive rounds
  * (q_split_expr r2; q_img_augment, q_tilerun r3); the guard makes the class
  * of bug a build-time failure instead of a round-later verdict finding.
  */
object OracleGuard {

  private val SumRe = "(?i)\\bsum\\s*\\(".r
  private val CastBigintRe = "(?is)^\\s*CAST\\s*\\(.*AS\\s+(?:BIGINT|INTEGER|INT)\\s*\\)\\s*$".r

  /** All expressions in `sql` that define alias `name` (via `AS name`). */
  private[graft] def defSites(sql: String, name: String): Seq[String] = {
    val asRe = ("(?i)\\bAS\\s+\"?" + java.util.regex.Pattern.quote(name) + "\"?\\b").r
    asRe.findAllMatchIn(sql).map { m =>
      // Walk backwards from the AS keyword to the start of this select-list
      // item: stop at a comma or opening paren with parens balanced.
      var depth = 0
      var start = 0
      var j = m.start - 1
      var done = false
      while (j >= 0 && !done) {
        sql(j) match {
          case ')' => depth += 1
          case '(' => if (depth == 0) { start = j + 1; done = true } else depth -= 1
          case ',' if depth == 0 => start = j + 1; done = true
          case _ =>
        }
        j -= 1
      }
      val seg = sql.substring(start, m.start)
      // The item may begin mid-clause (e.g. right after SELECT/THEN/WITH);
      // cut at the last keyword boundary so only the expression remains.
      val kw = "(?i)\\b(?:SELECT|THEN|ELSE|WHEN|FROM|WHERE|ON|AND|OR|BY|UNION|ALL|RECURSIVE)\\b".r
      val cuts = kw.findAllMatchIn(seg).map(_.end).toList
      (if (cuts.nonEmpty) seg.substring(cuts.max) else seg).trim
    }.toList
  }

  /** Offending (queryName, columnName) pairs: integral Spark output columns
    * whose only oracle definitions contain an un-cast integer sum. */
  def violations(name: String, sql: String, schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq
      .filter(f => f.dataType == LongType || f.dataType == IntegerType)
      .flatMap { f =>
        val defs = defSites(sql, f.name)
        val sumDefs = defs.filter(d => SumRe.findFirstIn(d).isDefined)
        val hasCastDef = defs.exists(d => CastBigintRe.findFirstIn(d).isDefined)
        if (sumDefs.nonEmpty && !hasCastDef &&
            !sumDefs.forall(d => CastBigintRe.findFirstIn(d).isDefined))
          Some(name -> f.name)
        else None
      }

  /** Run the lint over every oracle-backed query; throws naming each
    * offending (query, column). `schemaOf` supplies the Spark result schema
    * — Verify passes a dumped-parquet reader (cheap footer read, no query
    * recompute); tests pass the live builders. Queries whose schema is
    * unavailable (builder/dump failed) are reported by the caller's own
    * error path, not silently linted-around. */
  def check(schemaOf: String => Option[StructType]): Unit = {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (qn, sql) =>
      schemaOf(qn).map(violations(qn, sql, _)).getOrElse(Nil)
    }
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "oracle HUGEINT guard: un-cast integer SUM feeding a BIGINT Spark column — " +
          bad.map { case (q, c) => s"$q.$c" }.mkString(", ") +
          " (wrap in CAST(... AS BIGINT))")
  }
}
