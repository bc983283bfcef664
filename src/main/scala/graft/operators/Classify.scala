package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * `-classify` / `-colorizer` — sequential and categorical classification with
 * the reference's exact break semantics
 * (`/root/reference/src/classification/mapshaper-class-stats.mjs`):
 *
 *  - equal-interval: breaks at min + i*(max-min)/numRanges (getEqualIntervalBreaks);
 *  - quantile: break i = ascending[floor(i * n/numRanges)] (getQuantileBreaks);
 *  - hybrid: quantile outer buckets, equal-interval inner over values in
 *    [lowerBreak, upperBreak) (getHybridBreaks);
 *  - class id = number of breaks <= value (getClassId: `while (val >= breaks[i]) i++`);
 *  - colorizer: class id -> color value, nodata -> null color
 *    (`src/commands/mapshaper-colorizer.mjs:25-90`), categorical by exact
 *    match, `random` via the reference's string-hash (fastStringHash).
 *
 * Scale: break computation is a one-off rank-select (a single sort shuffle
 * emitting k values); classification itself is pure codegen column math.
 */
object Classify {

  /** Class id of a value given ascending breaks: count of breaks <= value.
   * Null-safe: null -> -1 (the reference's null class). Codegen arithmetic. */
  def classId(value: Column, breaks: Seq[Double]): Column = {
    val id = breaks.map(b => when(value >= b, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    when(value.isNull, -1).otherwise(id).cast("int")
  }

  /** Discrete colorizer: class id -> colors(i); null/invalid -> nullColor. */
  def colorize(value: Column, breaks: Seq[Double], colors: Seq[String],
               nullColor: String = null): Column = {
    require(colors.length == breaks.length + 1,
      s"need ${breaks.length + 1} colors for ${breaks.length} breaks")
    val id = classId(value, breaks)
    colors.zipWithIndex.foldLeft(lit(nullColor)) { case (acc, (c, i)) =>
      when(id === i, c).otherwise(acc)
    }
  }

  /** Categorical colorizer: exact category match -> color; unmatched ->
   * otherColor; null -> nullColor (getCategoricalColorFunction). */
  def colorizeCategorical(value: Column, categories: Seq[String], colors: Seq[String],
                          otherColor: String = null, nullColor: String = null): Column = {
    require(colors.length == categories.length, "colors must match categories")
    val base = when(value.isNull, nullColor).otherwise(otherColor)
    categories.zip(colors).foldLeft(base) { case (acc, (cat, c)) =>
      when(value === cat, c).otherwise(acc)
    }
  }

  /** The reference's fastStringHash (string-hash, public domain): h = 5381,
   * then h = ToInt32(h*33) ^ charCode scanning from the END of the string;
   * returns |h|. Used by the `random` colorizer. */
  def fastStringHash(s: String): Long = {
    var hash = 5381
    var i = s.length
    while (i > 0) {
      i -= 1
      hash = ((hash * 33L).toInt) ^ s.charAt(i).toInt
    }
    // JS Math.abs(-2^31) exceeds int32 — abs in 64-bit like the reference
    math.abs(hash.toLong)
  }

  /** `random` colorizer: deterministic color from the value's string hash. */
  def colorizeRandom(value: Column, colors: Seq[String]): Column = {
    val hashUdf = udf((s: String) => if (s == null) null
      else colors((fastStringHash(s) % colors.length).toInt))
    hashUdf(value.cast("string"))
  }

  // ------------------------------------------------------------ break makers

  /** Equal-interval breaks from data min/max (one distributed agg). */
  def equalIntervalBreaks(df: DataFrame, valueCol: String, numBreaks: Int): Seq[Double] = {
    val r = df.agg(min(col(valueCol).cast("double")), max(col(valueCol).cast("double"))).head()
    equalIntervalBreaksOf(r.getDouble(0), r.getDouble(1), numBreaks)
  }

  def equalIntervalBreaksOf(minVal: Double, maxVal: Double, numBreaks: Int): Seq[Double] = {
    val numRanges = numBreaks + 1
    val interval = (maxVal - minVal) / numRanges
    (1 until numRanges).map(i => minVal + i * interval)
  }

  /** Quantile breaks: ascending[floor(i * n/numRanges)] — exact DISTRIBUTED
   * rank-select. A bare `Window.orderBy` would sort everything through ONE
   * task; instead the values are range-partitioned, ranked per partition in
   * parallel, and globalized with driver-side prefix sums (k tiny rows out). */
  def quantileBreaks(spark: SparkSession, df: DataFrame, valueCol: String,
                     numBreaks: Int): Seq[Double] = {
    import spark.implicits._
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val vals = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
      .repartitionByRange(parts, col("v"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // ranked + counted below without recomputing
    val counts = vals.groupBy("_pid").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val n = counts.map(_._2).sum
    val prefix = counts.scanLeft(0L)(_ + _._2).init
    val prefixBc = spark.sparkContext.broadcast(
      counts.map(_._1).zip(prefix).toMap)
    val numRanges = numBreaks + 1
    val targets = (1 until numRanges)
      .map(i => math.floor(i * (n.toDouble / numRanges)).toLong)
    // ranks computed per range-partition IN PARALLEL; global rank = prefix + local
    val w = Window.partitionBy(col("_pid")).orderBy(col("v"))
    val prefixUdf = udf((pid: Int) => prefixBc.value.getOrElse(pid, 0L))
    val out = vals
      .withColumn("rnk", row_number().over(w) - 1 + prefixUdf(col("_pid")))
      .filter(col("rnk").isin(targets: _*))
      .orderBy("rnk")
      .select("v").as[Double].collect().toSeq
    vals.unpersist()
    out
  }

  /** Hybrid breaks: quantile outer, equal-interval inner over
   * [lowerBreak, upperBreak) (getHybridBreaks). */
  def hybridBreaks(spark: SparkSession, df: DataFrame, valueCol: String,
                   numBreaks: Int): Seq[Double] = {
    val qb = quantileBreaks(spark, df, valueCol, numBreaks)
    if (numBreaks < 3) return qb
    val lower = qb.head
    val upper = qb.last
    val inner = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v") >= lower && col("v") < upper)
    val innerBreaks = equalIntervalBreaks(inner, "v", numBreaks - 2)
    lower +: innerBreaks :+ upper
  }
}
