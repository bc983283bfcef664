package graft

import java.nio.file.Files

import graft.streaming.TileRun
import graft.tables.{Images, Synthetic}

class TileRunSpec extends SparkSuite {

  test("tile run is checkpoint-resumable with consistent lineage") {
    val layer = Synthetic.polygonLayer(16, seed = 5L)
    val imgs = Images.generate(spark, 400).toDF().cache()
    val dir = Files.createTempDirectory("tilerun").toString

    // full reference run
    val refDir = Files.createTempDirectory("tilerun_ref").toString
    val full = TileRun.run(spark, imgs, layer, refDir, coarseRes = 2, fineRes = 8)
    assert(full.nonEmpty)

    // crashed run: stops after 2 groups
    val part1 = TileRun.run(spark, imgs, layer, dir, coarseRes = 2, fineRes = 8, failAfter = 2)
    assert(part1.size == 2)
    assert(TileRun.completedGroups(dir).size == 2)

    // resume: processes exactly the remaining groups, skips completed ones
    val part2 = TileRun.run(spark, imgs, layer, dir, coarseRes = 2, fineRes = 8)
    assert(part1.size + part2.size == full.size)
    assert(part1.map(_.group).toSet.intersect(part2.map(_.group).toSet).isEmpty)

    // lineage identical to the uninterrupted run (deterministic checksums)
    val refByGroup = full.map(m => m.group -> ((m.inputRows, m.outputRows, m.checksum))).toMap
    (part1 ++ part2).foreach { m =>
      assert(refByGroup(m.group) == ((m.inputRows, m.outputRows, m.checksum)), s"group ${m.group}")
    }

    // a second resume is a no-op
    assert(TileRun.run(spark, imgs, layer, dir, coarseRes = 2, fineRes = 8).isEmpty)

    // output data complete: same total rows as reference
    val a = spark.read.parquet(s"$dir/tiles").count()
    val b = spark.read.parquet(s"$refDir/tiles").count()
    assert(a == b && a == full.map(_.outputRows).sum)
  }
}
