package graft

import org.apache.spark.sql.functions._

import graft.operators.{SpatialJoin, Tiling}
import graft.tables.{Images, Synthetic}

/**
 * Plan-quality assertions: the claims "filters push down", "columns prune",
 * "hot path stays in whole-stage codegen", "payload bytes are never read by
 * spatial queries" are tested here, not just asserted in prose.
 */
class PlanSpec extends SparkSuite {

  private def imagesParquet: String =
    Images.ensureParquet(spark, "/root/repo/data", "plantest", 200)

  test("spatial pipeline scan prunes to narrow columns (no bytes/caption)") {
    val df = spark.read.parquet(imagesParquet)
      .select(col("image_id"), col("phash"))
      .withColumn("x", graft.functions.GraftFunctions.phashLon(col("phash")))
      .withColumn("y", graft.functions.GraftFunctions.phashLat(col("phash")))
    val joined = SpatialJoin.broadcastJoin(spark, df, "x", "y", Synthetic.oracleLayer)
    val scan = joined.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("image_id") && readSchema.contains("phash"))
    assert(!readSchema.contains("bytes") && !readSchema.contains("caption"),
      s"payload columns must be pruned: $readSchema")
  }

  test("filter on parquet source is pushed down") {
    val df = spark.read.parquet(s"$Sf/lineitem.parquet")
      .filter(col("l_quantity") >= 30.0)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity,30.0)"), plan.take(2000))
  }

  test("cell/PIP expressions run inside WholeStageCodegen") {
    val bc = spark.sparkContext.broadcast(Synthetic.oracleLayer)
    val df = spark.range(100)
      .withColumn("x", (col("id") % 100).cast("double"))
      .withColumn("y", (col("id") % 50).cast("double"))
      .withColumn("cell", graft.functions.SpatialExprs.cellIdCol(col("x"), col("y"), 8))
      .withColumn("pk", graft.functions.SpatialExprs.pipFirstKey(col("x"), col("y"), bc))
    // '*' node prefixes mark whole-stage-codegen spans; verify by node type too
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString.take(1000))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEval"), plan.take(1000))
    // sanity: results identical to the interpreted (non-codegen) path
    val got = df.select("id", "cell", "pk").collect()
    got.foreach { r =>
      val x = (r.getLong(0) % 100).toDouble
      val y = (r.getLong(0) % 50).toDouble
      assert(r.getLong(1) == graft.cell.CellIndex.cellId(x, y, 8))
      assert(r.getLong(2) == Synthetic.oracleLayer.findFirstKey(x, y))
    }
  }

  test("tile assignment plan never references the binary payload") {
    val imgs = spark.read.parquet(imagesParquet)
    val tiles = Tiling.tileAssign(spark, imgs, tileGrid = 2, res = 9, Some(Synthetic.oracleLayer))
    // the physical scan must not materialize the payload column
    val readSchema = tiles.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("bytes"), readSchema)
  }

  test("broadcast PIP join produces no shuffle of the point side") {
    val df = spark.range(1000)
      .withColumn("x", (col("id") % 100).cast("double"))
      .withColumn("y", (col("id") % 50).cast("double"))
    val joined = SpatialJoin.broadcastJoin(spark, df, "x", "y", Synthetic.oracleLayer)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"broadcast PIP join must be shuffle-free:\n${plan.take(1500)}")
  }
}
