package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.index.PolygonLayer
import graft.operators.SpatialJoin

/**
 * Checkpoint-resumable tile run with per-partition lineage records — the
 * engine's answer to the north rule's "resumable from checkpoint with
 * per-partition lineage + metrics" requirement. Mapshaper's analog is the
 * per-input-file batch pipeline + `.msx` session snapshot
 * (`/root/reference/src/cli/mapshaper-run-commands.mjs:313-345`,
 * `src/pack/mapshaper-pack.mjs`); here the unit of work is a *cell group*
 * (coarse-resolution cell), the natural shard of the spatial join.
 *
 * Layout under `outDir`:
 *   tiles/group=<g>/...parquet   output rows of each completed cell group
 *   manifest/<g>.json            lineage record, written AFTER the group's data
 *
 * The manifest write is the commit point: a crashed run leaves at most a
 * non-manifested partial directory, which the retry overwrites (idempotent —
 * same deterministic input → same output). `resume` therefore never
 * recomputes completed groups and never double-counts.
 *
 * Lineage per group: input row count, output row count, XOR-checksum of the
 * joined keys (order-independent), wall-clock ms — enough to audit each
 * partition of a 10^12-row run without reading its data.
 */
object TileRun {

  final case class GroupManifest(
      group: Long,
      inputRows: Long,
      outputRows: Long,
      checksum: Long,
      wallMs: Long)

  /** Cell groups present in the image table at the coarse resolution. */
  def planGroups(spark: SparkSession, images: DataFrame, coarseRes: Int): Array[Long] = {
    import spark.implicits._
    images
      .select(phashLon(col("phash")).as("x"), phashLat(col("phash")).as("y"))
      .select(cellId(col("x"), col("y"), coarseRes).as("g"))
      .distinct().as[Long].collect().sorted
  }

  def completedGroups(outDir: String): Set[Long] = {
    val dir = new java.io.File(s"$outDir/manifest")
    if (!dir.exists()) Set.empty
    else dir.listFiles().filter(_.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json").toLong).toSet
  }

  /**
   * Run (or resume) the tile pipeline: PIP join + cell assignment per cell
   * group. Returns the manifests of groups processed in THIS invocation.
   * `failAfter` (tests only): abort after N groups to simulate a crash.
   */
  def run(
      spark: SparkSession,
      images: DataFrame,
      layer: PolygonLayer,
      outDir: String,
      coarseRes: Int = 3,
      fineRes: Int = 8,
      failAfter: Int = Int.MaxValue): Seq[GroupManifest] = {
    import spark.implicits._
    Files.createDirectories(Paths.get(s"$outDir/manifest"))
    val groups = planGroups(spark, images, coarseRes)
    val done = completedGroups(outDir)
    val todo = groups.filterNot(done.contains)

    val located = images
      .withColumn("x", phashLon(col("phash")))
      .withColumn("y", phashLat(col("phash")))
      .withColumn("g", cellId(col("x"), col("y"), coarseRes))

    var processed = 0
    val out = Seq.newBuilder[GroupManifest]
    todo.foreach { g =>
      if (processed < failAfter) {
        val t0 = System.nanoTime()
        val part = located.filter(col("g") === g)
        val joined = SpatialJoin.broadcastJoin(spark, part, "x", "y", layer)
          .withColumn("cell_id", cellId(col("x"), col("y"), fineRes))
          .select(col("image_id"), col("cell_id"), col("poly_key"))
        // one pass: rows + order-independent checksum of the join output
        val (inRows, outRows, checksum) = {
          val inN = part.count()
          val agg = joined.agg(
            count(lit(1)).as("n"),
            coalesce(expr("bit_xor(xxhash64(image_id, cell_id, poly_key))"), lit(0L)).as("xor"))
            .as[(Long, Long)].head()
          (inN, agg._1, agg._2)
        }
        joined.write.mode(SaveMode.Overwrite).parquet(s"$outDir/tiles/group=$g")
        val m = GroupManifest(g, inRows, outRows, checksum,
          (System.nanoTime() - t0) / 1000000)
        // manifest write = commit point
        Files.writeString(Paths.get(s"$outDir/manifest/$g.json"),
          s"""{"group":$g,"input_rows":${m.inputRows},"output_rows":${m.outputRows},"checksum":${m.checksum},"wall_ms":${m.wallMs}}""")
        out += m
        processed += 1
      }
    }
    out.result()
  }
}
