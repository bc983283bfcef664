package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-6 optimization measurement harness (guide §1: measure first; §1.4
 * noop-sink isolation). NOT the driver bench — graft.Bench is frozen; this
 * main exists so every optimization in OPTIMIZATION_r06.md can cite numbers
 * and .explain("formatted") plans without touching the frozen harness.
 *
 * Usage: sbt "runMain graft.BenchExtra <tag> [queryFilter...]"
 *  - times each bench query with the noop sink (min of 3 after 1 warmup),
 *  - writes plans/r06/<query>_<tag>.txt with the formatted physical plan,
 *  - times the headline pipeline (same entry points Bench calls),
 *  - prints one JSON line with all numbers.
 *
 * `sbt "runMain graft.BenchExtra kernels"` instead runs the PIP-kernel
 * microbenchmark (grid index vs R-tree reference path, single thread) and
 * the in-session A/B of the full headline with each kernel — the two
 * measurements cited by OPTIMIZATION_r06.md for the GridPipIndex change.
 */
object BenchExtra {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** PIP kernel microbench + in-session grid/tree A/B on the headline. */
  private def kernels(): Unit = {
    val layer = tables.Synthetic.polygonLayer(1024, seed = 42L)
    val n = 4000000
    val rng = new tables.SplitMix64(12345L)
    val xs = Array.fill(n)(rng.nextDouble() * 100)
    val ys = Array.fill(n)(rng.nextDouble() * 100)
    def kt(label: String)(f: => Long): Unit = {
      f; f // warmup (JIT)
      val t0 = System.nanoTime()
      val acc = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"KERNEL $label%-22s ${dt}%7.3f s  ${n / dt / 1e6}%7.2f Mprobe/s (acc=$acc)")
    }
    kt("findFirstKey grid") {
      var a = 0L; var i = 0; while (i < n) { a += layer.findFirstKey(xs(i), ys(i)); i += 1 }; a
    }
    kt("findFirstKey tree") {
      var a = 0L; var i = 0; while (i < n) { a += layer.findFirstKeyTree(xs(i), ys(i)); i += 1 }; a
    }
    kt("findKeys grid") {
      var a = 0L; var i = 0; while (i < n) { a += layer.findKeys(xs(i), ys(i)).length; i += 1 }; a
    }
    kt("findKeys tree") {
      var a = 0L; var i = 0; while (i < n) { a += layer.findKeysTree(xs(i), ys(i)).length; i += 1 }; a
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]").appName("graft-kernels")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val input = Bench.headlineInput(s, "/root/repo/data/images_sf0.1.parquet")
    Bench.headline(s, input, Bench.Rep) // warmup
    var tg = Double.MaxValue; var tt = Double.MaxValue
    for (_ <- 0 until 3) { // alternate so window drift hits both kernels
      graft.index.PolygonLayer.useGrid = true
      val t0 = System.nanoTime(); Bench.headline(s, input, Bench.Rep)
      tg = math.min(tg, (System.nanoTime() - t0) / 1e9)
      graft.index.PolygonLayer.useGrid = false
      val t1 = System.nanoTime(); Bench.headline(s, input, Bench.Rep)
      tt = math.min(tt, (System.nanoTime() - t1) / 1e9)
    }
    graft.index.PolygonLayer.useGrid = true
    println(f"KERNEL headline A/B: grid=min $tg%.3f s  tree=min $tt%.3f s")
    s.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("kernels")) { kernels(); return }
    val tag = if (args.nonEmpty) args(0) else "before"
    val only = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val planDir = Paths.get("plans", "r06")
    Files.createDirectories(planDir)

    val benchQueries = Seq(
      "q_pip_join", "q_cell_assign", "q_knn", "q_dist_join", "q_dissolve",
      "q_calc_group", "q_attr_join", "q_join_duplication", "q_minhash_pairs",
      "q_ann_lsh", "q_img_cell", "q_img_pip", "q_img_tiles")
        .filter(q => only.isEmpty || only.contains(q))

    // per-query: capture plan, 1 warmup + min-of-3 noop-sink timings
    val qTimes = benchQueries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        s.sparkContext.setJobDescription(name)
        val df = fn(s, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(planDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        def once(): Double = time {
          fn(s, sfDir).write.mode("overwrite").format("noop").save()
        }
        once() // warmup (codegen + scan cache)
        name -> Seq.fill(3)(once()).min
      }
    }
    s.sparkContext.setJobDescription(null)

    // headline: same entry points the frozen Bench calls, in-process
    val tag0 = sfDir.replaceAll(".*/", "")
    val nImages = graft.tables.Images.rowsForSf(sfDir)
    graft.tables.Images.ensureParquet(s, "/root/repo/data", tag0, nImages)
    val imagesPath = s"/root/repo/data/images_$tag0.parquet"
    val headTimes = if (only.isEmpty || only.contains("headline")) {
      s.sparkContext.setJobDescription("headline")
      val input = Bench.headlineInput(s, imagesPath)
      Bench.headline(s, input, 8) // warmup
      val t = Seq.fill(3)(time(Bench.headline(s, input, Bench.Rep))).min
      input.unpersist()
      Seq("headline" -> t)
    } else Seq.empty

    val all = qTimes ++ headTimes
    val qJson = all.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""BENCHEXTRA {"tag":"$tag","total":${f"$total%.3f"},"queries":$qJson,"sf":"$sfDir"}""")
    s.stop()
  }
}
