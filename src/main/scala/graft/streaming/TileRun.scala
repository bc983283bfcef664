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
 *   tiles/g=<g>/...parquet        output rows of each completed cell group
 *   manifest/<g>.json             lineage record, written AFTER the group's data
 *
 * Scale shape: ONE partitioned write + TWO small aggregations per invocation,
 * regardless of the number of groups — `write.partitionBy("g")` with dynamic
 * partition overwrite shards the output, and the lineage (input rows, output
 * rows, order-independent XOR checksum) is computed by a single `groupBy("g")`
 * each over the input and the written output. No per-group full-table rescans:
 * at 10^12 rows the whole run is O(1) Spark jobs.
 *
 * The manifest write is the commit point: a crashed run leaves at most
 * non-manifested partition directories, which the retry overwrites (dynamic
 * partition overwrite is idempotent — same deterministic input → same output).
 * `resume` therefore never recomputes completed groups and never double-counts.
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
   * Run (or resume) the tile pipeline: PIP join + cell assignment, partitioned
   * by cell group. Returns the manifests of groups processed in THIS
   * invocation. `failAfter` (tests only): process at most N groups to simulate
   * a crash mid-run.
   */
  def run(
      spark: SparkSession,
      images: DataFrame,
      layer: PolygonLayer,
      outDir: String,
      coarseRes: Int = 3,
      fineRes: Int = 8,
      failAfter: Int = Int.MaxValue,
      inputManifest: Option[graft.tables.TableManifest.Manifest] = None): Seq[GroupManifest] = {
    import spark.implicits._
    Files.createDirectories(Paths.get(s"$outDir/manifest"))
    val groups = planGroups(spark, images, coarseRes)
    val done = completedGroups(outDir)
    val todo = groups.filterNot(done.contains).take(failAfter)
    if (todo.isEmpty) return Seq.empty
    val t0 = System.nanoTime()

    // resume-time file pruning: with a derived-stats manifest (per-file
    // min/max of the coarse group), a resume that has only a few groups left
    // opens only the input files whose group range can still contain them —
    // at 10^12 rows this turns "resume rescans the table" into "resume
    // rescans the crashed shard" for spatially-clustered layouts. The g
    // filter below stays as the exactness guarantee (pruning is a superset).
    val input = inputManifest match {
      case Some(m) =>
        val cand = graft.tables.TableManifest
          .pruneFilesForValues(m, "g", todo.toIndexedSeq)
        if (cand.isEmpty) images.limit(0)
        else spark.read.parquet(cand.map(_.path): _*)
      case None => images
    }
    val located = input
      .withColumn("x", phashLon(col("phash")))
      .withColumn("y", phashLat(col("phash")))
      .withColumn("g", cellId(col("x"), col("y"), coarseRes))
      .filter(col("g").isin(todo.toIndexedSeq: _*))

    // lineage: input rows per group (one shuffle of (g, count) partials)
    val inRows = located.groupBy("g").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

    val joined = SpatialJoin.broadcastJoin(spark, located, "x", "y", layer)
      .withColumn("cell_id", cellId(col("x"), col("y"), fineRes))
      .select(col("image_id"), col("cell_id"), col("poly_key"), col("g"))

    // ONE job writes every todo group; dynamic overwrite touches only the
    // partitions present in `joined`, so completed groups are never rewritten
    joined.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("g")
      .parquet(s"$outDir/tiles")

    // lineage from the committed output itself (reads back only the 3 narrow
    // columns of the todo partitions): rows + order-independent checksum
    val tilesDir = new java.io.File(s"$outDir/tiles")
    val anyWritten = tilesDir.exists() &&
      tilesDir.listFiles().exists(_.getName.startsWith("g="))
    val outAgg: Map[Long, (Long, Long)] =
      if (!anyWritten) Map.empty
      else spark.read.parquet(s"$outDir/tiles")
        .filter(col("g").isin(todo.toIndexedSeq: _*))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(xxhash64(image_id, cell_id, poly_key))"), lit(0L)).as("xor"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

    val wallMs = (System.nanoTime() - t0) / 1000000
    todo.toSeq.map { g =>
      val (outN, checksum) = outAgg.getOrElse(g, (0L, 0L))
      val m = GroupManifest(g, inRows.getOrElse(g, 0L), outN, checksum, wallMs)
      // manifest write = commit point (data for g is already durable)
      Files.writeString(Paths.get(s"$outDir/manifest/$g.json"),
        s"""{"group":$g,"input_rows":${m.inputRows},"output_rows":${m.outputRows},"checksum":${m.checksum},"wall_ms":${m.wallMs}}""")
      m
    }
  }
}
