package graft

import org.apache.spark.sql.functions._

import graft.index.PolygonLayer
import graft.streaming.GeoStream

/** Streaming spatial ingestion: incremental file arrival, exactly-once
 * delivery across query restarts, and batch/stream parity. */
class GeoStreamSpec extends SparkSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Array[Double] =
    Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)

  private val layer = PolygonLayer.fromShapes(Seq(
    1L -> Seq(rect(0, 0, 50, 50)),
    2L -> Seq(rect(50, 0, 100, 50)),
    3L -> Seq(rect(0, 50, 100, 100))))

  test("incremental ingest is exactly-once across restarts and matches batch") {
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("geo_stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("geo_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("geo_ck").toString

    def mkPoints(ids: Range) = ids.map { i =>
      (i.toLong, (i * 48271 % 100000) / 1000.0, (i * 69621 % 100000) / 1000.0)
    }.toDF("id", "x", "y")

    // drop 1: ids 1-400 arrive
    mkPoints(1 to 400).coalesce(1).write.parquet(s"$streamDir/drop1")
    val schema = spark.read.parquet(s"$streamDir/drop1").schema
    def assigned = GeoStream.pipAssignStream(spark,
      spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(streamDir),
      "x", "y", layer)
    GeoStream.ingestAvailable(assigned, outDir, ckDir)
    val after1 = spark.read.parquet(outDir)
    val batch1 = graft.operators.SpatialJoin.broadcastJoin(
      spark, mkPoints(1 to 400), "x", "y", layer)
    assert(after1.count() == batch1.count())

    // drop 2: ids 401-700 arrive; a FRESH query on the same checkpoint
    // must process only the new file
    mkPoints(401 to 700).coalesce(1).write.parquet(s"$streamDir/drop2")
    GeoStream.ingestAvailable(assigned, outDir, ckDir)
    val after2 = spark.read.parquet(outDir)
    val batchAll = graft.operators.SpatialJoin.broadcastJoin(
      spark, mkPoints(1 to 700), "x", "y", layer)
    assert(after2.count() == batchAll.count(), "exactly-once total after second drain")

    // full row parity, not just counts
    val streamedSet = after2.select("id", "poly_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchSet = batchAll.select("id", "poly_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedSet == batchSet)

    // third drain with NO new files: nothing appends (commit-log idempotence)
    GeoStream.ingestAvailable(assigned, outDir, ckDir)
    assert(spark.read.parquet(outDir).count() == after2.count())
  }

  test("watermarked per-polygon window counts match the batch aggregation") {
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("geo_win").toString
    val pts = (1 to 500).map { i =>
      (i.toLong, (i * 48271 % 100000) / 1000.0, (i * 69621 % 100000) / 1000.0,
        new java.sql.Timestamp(1700000000000L + (i % 7) * 600000L))
    }.toDF("id", "x", "y", "ts")
    pts.coalesce(1).write.parquet(s"$streamDir/drop1")
    val schema = spark.read.parquet(s"$streamDir/drop1").schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(streamDir)
    val counts = GeoStream.pipWindowCounts(
      GeoStream.pipAssignStream(spark, stream, "x", "y", layer), "ts")
    val q = counts.writeStream.outputMode("complete").format("memory")
      .queryName("geo_win_counts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM geo_win_counts")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.operators.SpatialJoin.broadcastJoin(spark, pts, "x", "y", layer)
      .groupBy(date_trunc("HOUR", col("ts")).as("w"), col("poly_key"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expected)
  }
}
