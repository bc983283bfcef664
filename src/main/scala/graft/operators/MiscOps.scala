package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Overlay

/**
 * Smaller command-surface operators:
 *
 *  - [[Split.byExpression]] — `-split` with an expression/field: each distinct
 *    value becomes a layer (`/root/reference/src/commands/mapshaper-split.mjs:9-60`).
 *  - [[Stitch.antimeridian]] — `-stitch`: remove antimeridian cuts in lat-lon
 *    polygon data by shifting west-side pieces +360, dissolving shared edges,
 *    and renormalizing (`mapshaper-stitch.mjs:12-60`).
 *  - [[Info.describe]] — `-info`: per-column stats (count, nulls, min, max)
 *    as a table (`src/commands/mapshaper-info.mjs:18-50`).
 */
object Split {

  /** Tag rows with their layer name (the split key); at scale this feeds
   * `write.partitionBy("layer")` — one job for any number of layers. */
  def byExpression(df: DataFrame, expr: Column): DataFrame =
    df.withColumn("layer", expr.cast("string"))

  /** Materialized per-layer views (layer count is user-bounded, like the
   * reference's one-layer-per-value output). */
  def toLayers(df: DataFrame, expr: Column): Map[String, DataFrame] = {
    val tagged = byExpression(df, expr)
    tagged.select("layer").distinct().collect().map(_.getString(0))
      .map(name => name -> tagged.filter(col("layer") === name).drop("layer"))
      .toMap
  }
}

object Stitch {

  private def lonRange(r: Array[Double]): (Double, Double) = {
    var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < r.length) {
      mn = math.min(mn, r(i)); mx = math.max(mx, r(i))
      i += 2
    }
    (mn, mx)
  }

  private def shiftLon(r: Array[Double], d: Double): Array[Double] = {
    val out = r.clone()
    var i = 0
    while (i < out.length) { out(i) += d; i += 2 }
    out
  }

  /**
   * Merge polygon pieces that were cut at the antimeridian: pieces touching
   * lon = -180 are shifted +360 onto the east side, shared cut edges cancel
   * in the mosaic dissolve, and fully-shifted output rings are renormalized
   * to [-180, 180]. Rings that genuinely span the meridian after merging are
   * returned in the 0..360 frame (the caller reprojects).
   */
  def antimeridian(rings: Seq[Array[Double]], eps: Double = 1e-9): Seq[Array[Double]] = {
    val shifted = rings.map { r =>
      val (mn, _) = lonRange(r)
      if (mn <= -180.0 + eps) shiftLon(r, 360.0) else r
    }
    val merged = Overlay.dissolve2(shifted.map(Seq(_)))
    merged.map { r =>
      val (mn, _) = lonRange(r)
      if (mn >= 180.0 - eps) shiftLon(r, -360.0) else r
    }
  }
}

object Info {

  /** Column statistics table: (column, dtype, n, n_null, min_s, max_s) —
   * one distributed aggregation for all columns. */
  def describe(spark: SparkSession, df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val total = count(lit(1)).as("_total")
    val row = df.agg(total, aggs: _*).head()
    val totalN = row.getLong(0)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    names.map { c =>
      val n = row.getAs[Long](s"_n_$c")
      (c, types(c), n, totalN - n,
        Option(row.getAs[String](s"_mn_$c")).getOrElse(""),
        Option(row.getAs[String](s"_mx_$c")).getOrElse(""))
    }.toDF("column", "dtype", "n", "n_null", "min_s", "max_s")
  }
}

/**
 * `-rectangles` — per-feature bbox rectangles with optional per-side offsets
 * (absolute, or fractions of the bbox width/height like the reference's
 * "N%" params, `mapshaper-rectangle.mjs:151-190` + `mapshaper-units.mjs:
 * 164-179`) and aspect-ratio fill-out about the bbox center (expand-only,
 * like Bounds.fillOut). Pure per-row arithmetic — codegen-adjacent, no
 * shuffle.
 */
object Rectangles {
  import org.apache.spark.sql.functions._

  /** offsets = (left, bottom, right, top); aspectRatio 0 = off. */
  def of(rings: DataFrame, ringCol: String,
         offsets: (Double, Double, Double, Double) = (0, 0, 0, 0),
         offsetsArePct: Boolean = false,
         aspectRatio: Double = 0.0): DataFrame = {
    val rectUdf = udf { (flat: Seq[Double]) =>
      var x0 = Double.MaxValue; var y0 = Double.MaxValue
      var x1 = Double.MinValue; var y1 = Double.MinValue
      var i = 0
      while (i + 1 < flat.length) {
        if (flat(i) < x0) x0 = flat(i)
        if (flat(i) > x1) x1 = flat(i)
        if (flat(i + 1) < y0) y0 = flat(i + 1)
        if (flat(i + 1) > y1) y1 = flat(i + 1)
        i += 2
      }
      val w = x1 - x0; val h = y1 - y0
      val (ol, ob, or_, ot) =
        if (offsetsArePct)
          (offsets._1 * w, offsets._2 * h, offsets._3 * w, offsets._4 * h)
        else offsets
      var bx0 = x0 - ol; var by0 = y0 - ob
      var bx1 = x1 + or_; var by1 = y1 + ot
      if (aspectRatio > 0) {
        val ar = (bx1 - bx0) / (by1 - by0)
        if (ar < aspectRatio) { // too tall: widen about the center
          val wNew = (by1 - by0) * aspectRatio
          val cx = (bx0 + bx1) / 2.0
          bx0 = cx - wNew / 2.0; bx1 = cx + wNew / 2.0
        } else if (ar > aspectRatio) { // too wide: heighten about the center
          val hNew = (bx1 - bx0) / aspectRatio
          val cy = (by0 + by1) / 2.0
          by0 = cy - hNew / 2.0; by1 = cy + hNew / 2.0
        }
      }
      Array(bx0, by0, bx1, by1)
    }
    rings.withColumn("rect", rectUdf(col(ringCol)))
  }
}

/**
 * `-uniq` with the reference's full option surface
 * (`src/commands/mapshaper-uniq.mjs:9-56`): occurrence counting per key in a
 * deterministic order; `max_count=` keeps the first n occurrences, `invert`
 * keeps the removed side, `index` keeps everything and annotates the 1-based
 * occurrence index. One window — the only shuffle is the key partition.
 */
object Uniq {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
            maxCount: Int = 1, invert: Boolean = false,
            index: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    // collision-safe working column: a user column named `index` must
    // survive non-index mode and only be replaced when index=true
    val withIdx = df.withColumn("_uniq_idx", row_number().over(w))
    if (index) withIdx.drop("index").withColumnRenamed("_uniq_idx", "index")
    else {
      val keep = col("_uniq_idx") <= maxCount
      withIdx.filter(if (invert) !keep else keep).drop("_uniq_idx")
    }
  }
}
