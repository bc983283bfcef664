package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed table join with the reference's full option surface
 * (`/root/reference/src/join/mapshaper-join-tables.mjs:23-188,393-425`):
 *
 *  - default: left join, **keep-first collision** — when several source rows
 *    share a key, only the first (in `orderCol` order) contributes copy
 *    fields (join-tables.mjs:106-115,249-257);
 *  - `fields`: which source columns to copy (default: all non-key);
 *  - `prefix`: rename copied fields;
 *  - `duplication`: 1:N joins duplicate the target row per match
 *    (join-tables.mjs:100-105);
 *  - `sumFields`: numeric accumulation over ALL matched source rows
 *    (join-tables.mjs:239-247);
 *  - unmatched targets keep nulls for join fields (join-tables.mjs:210-213);
 *  - [[JoinResult.unmatched]] / [[JoinResult.unjoined]] side outputs ≡
 *    left-anti / right-anti (join-tables.mjs:166-179).
 *
 * Everything is expressed as Catalyst joins/windows — broadcast vs shuffle is
 * the optimizer's choice; the keep-first dedup is one partial-aggregatable
 * window over the (small) source side only.
 */
object JoinOp {

  final case class JoinResult(joined: DataFrame, unmatched: DataFrame, unjoined: DataFrame)

  def join(
      target: DataFrame,
      rawSource: DataFrame,
      targetKey: String,
      sourceKey: String,
      fields: Seq[String] = Nil,
      prefix: String = "",
      duplication: Boolean = false,
      sumFields: Seq[String] = Nil,
      orderCol: Option[String] = None,
      where: Option[Column] = None): JoinResult = {

    // `where=` match filter: only source rows passing the predicate are
    // eligible to match (ref `src/join/mapshaper-join-filter.mjs:9-29`);
    // unmatched/unjoined side outputs see the filtered source too
    val source = where.map(rawSource.filter).getOrElse(rawSource)

    val copyFields =
      if (fields.nonEmpty) fields
      else source.columns.filterNot(c => c == sourceKey || orderCol.contains(c)).toSeq

    // source side reduced to one row per key for copy fields (keep-first).
    // The reference's "first" is file order (join-tables.mjs:106-115); a
    // DataFrame has no file order, and monotonically_increasing_id() depends
    // on partition layout — nondeterministic across repartitionings. Without
    // an explicit orderCol the collision winner is therefore defined as the
    // row that is SMALLEST under the full-tuple ordering of its columns: a
    // stable content-derived total order, identical at any parallelism.
    val srcFirst =
      if (duplication) source
      else {
        val ord: Seq[Column] = orderCol match {
          case Some(c) => Seq(col(c))
          case None => source.columns.filterNot(_ == sourceKey).map(col).toSeq
        }
        val ordCols = if (ord.nonEmpty) ord else Seq(lit(1))
        val w = Window.partitionBy(col(sourceKey)).orderBy(ordCols: _*)
        source.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      }

    val renamed = copyFields.foldLeft(srcFirst) { (df, f) =>
      df.withColumnRenamed(f, prefix + f)
    }.select((col(sourceKey) +: copyFields.map(f => col(prefix + f))): _*)

    var joined = target.join(renamed, target(targetKey) === renamed(sourceKey),
      if (duplication) "inner" else "left").drop(renamed(sourceKey))

    if (sumFields.nonEmpty) {
      val sums = source.groupBy(col(sourceKey).as("_sk"))
        .agg(sumFields.map(f => sum(col(f)).as(s"${prefix}sum_$f")).head,
          sumFields.tail.map(f => sum(col(f)).as(s"${prefix}sum_$f")): _*)
      joined = joined.join(sums, joined(targetKey) === sums("_sk"), "left").drop("_sk")
    }

    val unmatched = target.join(source, target(targetKey) === source(sourceKey), "left_anti")
    val unjoined = source.join(target, target(targetKey) === source(sourceKey), "left_anti")
    JoinResult(joined, unmatched, unjoined)
  }

  /**
   * Mode-of-matched-values with deterministic tie-break — the heart of the
   * reference's `-fuzzy-join` (mode with margin,
   * `src/commands/mapshaper-fuzzy-join.mjs:20-162`,
   * `src/utils/mapshaper-calc-utils.mjs:54-59`). Returns per-group
   * (mode value, count, margin = lead over runner-up).
   */
  def modeWithMargin(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_c").desc, col(valueCol))
    counts
      .withColumn("_rn", row_number().over(w))
      .withColumn("_next", lead(col("_c"), 1, 0L).over(w))
      .filter(col("_rn") === 1)
      .select(col(groupCol),
        col(valueCol).as("mode_value"),
        col("_c").as("mode_count"),
        (col("_c") - col("_next")).as("margin"))
  }
}
