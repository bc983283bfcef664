package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.TableManifest

class TableManifestSpec extends SparkSuite {

  import spark.implicits._

  test("manifest stats come from footers; pruning skips files, results exact") {
    // range-partitioned write => files carry disjoint phash ranges
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    val df = (0L until 20000L).map(i => (i, i * 31 % 100000, s"cap$i"))
      .toDF("image_id", "phash", "caption")
    df.repartitionByRange(8, col("phash")).write.parquet(dir)

    val m = TableManifest.build(dir, Seq("phash", "image_id"))
    assert(m.files.size == 8)
    assert(m.totalRows == 20000)
    // stats present and ordered disjointly after the range partitioning
    val ranges = m.files.map(_.stats("phash")).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin)
      case _ =>
    }

    // pruning: a narrow phash range touches a strict subset of files
    val (lo, hi) = (10000L, 20000L)
    val pruned = TableManifest.pruneFiles(m, "phash", lo, hi)
    assert(pruned.size < m.files.size && pruned.nonEmpty,
      s"${pruned.size} of ${m.files.size}")

    // and the pruned scan returns EXACTLY the full-scan result
    val got = TableManifest.prunedScan(spark, m, "phash", lo, hi)
      .select("image_id").as[Long].collect().sorted
    val want = spark.read.parquet(dir)
      .filter(col("phash") >= lo && col("phash") <= hi)
      .select("image_id").as[Long].collect().sorted
    assert(got.sameElements(want) && want.nonEmpty)

    // snapshot save round-trip is well-formed JSON lines
    val snap = Files.createTempFile("manifest", ".jsonl").toString
    TableManifest.save(m, snap)
    val lines = scala.io.Source.fromFile(snap).getLines().toSeq
    assert(lines.length == 9) // header + 8 files
    assert(lines.head.contains("\"n_files\":8"))
  }
}
