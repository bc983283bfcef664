package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.{SpatialJoin, Tiling}
import graft.tables.{Images, Synthetic}

/**
 * Benchmark main. Headline metric (per BASELINE.json): spatial-join +
 * tile-assignment throughput in images/sec over the image table with a
 * polygon layer, plus the two-parallelism scaling evidence (local[8] vs
 * local[32] on identical input — the sandbox stand-in for N vs 4N executors).
 *
 * Prints ONE JSON line:
 * {"metric":...,"value":<total sec>,"unit":"sec","queries":{...},"sf":...,
 *  "images_per_sec":...,"scaling":{"cores_lo":8,"ips_lo":...,"cores_hi":32,
 *  "ips_hi":...,"efficiency":...}}
 */
object Bench {

  /** Headline pipeline: project (image_id, w, h, phash) — never `bytes` —
   * derive location, cell id, broadcast PIP join, tile assignment, aggregate. */
  def headline(spark: SparkSession, imagesPath: String): Long = {
    val layer = Synthetic.polygonLayer(1024, seed = 42L)
    val imgs = spark.read.parquet(imagesPath)
      .select(col("image_id"), col("w"), col("h"), col("phash"))
      .withColumn("x", phashLon(col("phash")))
      .withColumn("y", phashLat(col("phash")))
      .withColumn("cell", cellId(col("x"), col("y"), 8))
    // image-level PIP join + per-tile (4x4) cell assignment with per-tile PIP
    // against the same broadcast layer: the full "spatial-join +
    // tile-assignment" pipeline of the north rule.
    val joined = SpatialJoin.broadcastJoin(spark, imgs, "x", "y", layer)
    val tiles = Tiling.tileAssign(spark, joined
      .select("image_id", "w", "h", "phash"), tileGrid = 4, res = 9, Some(layer))
    val a = joined.groupBy("poly_key").agg(count(lit(1)).as("n")).count()
    val b = tiles.groupBy("cell_id", "poly_key").agg(count(lit(1)).as("n")).count()
    a + b
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nImages = Images.rowsForSf(sfDir)
    val tag = sfDir.replaceAll(".*/", "")

    // ---------- scaling evidence: same job, same input, 8 vs `cpus` cores ----
    val loCores = math.max(2, cpus / 4)
    val sLo = session(loCores)
    val imagesPath = Images.ensureParquet(sLo, "/root/repo/data", tag, nImages)
    headline(sLo, imagesPath) // warmup (codegen + JIT)
    val tLo = time(headline(sLo, imagesPath))
    sLo.stop()

    val s = session(cpus)
    headline(s, imagesPath) // warmup
    val tHi = time(headline(s, imagesPath))
    val ipsLo = nImages / tLo
    val ipsHi = nImages / tHi
    val eff = ipsHi / (ipsLo * (cpus.toDouble / loCores))

    // ---------- representative per-operator timings at `cpus` cores ----------
    val benchQueries = Seq(
      "q_pip_join", "q_cell_assign", "q_knn", "q_dist_join", "q_dissolve",
      "q_calc_group", "q_attr_join", "q_join_duplication", "q_minhash_pairs",
      "q_ann_topk", "q_img_cell", "q_img_pip", "q_img_tiles")
    val qTimes = benchQueries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val sec = time {
          fn(s, sfDir).write.mode("overwrite").format("noop").save()
        }
        name -> sec
      }
    }
    val qJson = qTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val total = tHi + qTimes.map(_._2).sum
    println(
      s"""{"metric":"spatial_join_tile_assign","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir","n_images":$nImages,"headline_sec":${f"$tHi%.3f"},"images_per_sec":${f"$ipsHi%.0f"},"scaling":{"cores_lo":$loCores,"ips_lo":${f"$ipsLo%.0f"},"cores_hi":$cpus,"ips_hi":${f"$ipsHi%.0f"},"efficiency":${f"$eff%.3f"}}}""")
    s.stop()
  }
}
