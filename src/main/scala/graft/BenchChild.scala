package graft

import org.apache.spark.sql.SparkSession

/**
 * One isolated headline measurement in a fresh JVM (spawned by [[Bench]]):
 * sequential SparkSessions in one JVM contaminate each other (dead contexts'
 * heap + fragmented old gen slow later sessions by >2x, measured), so each
 * parallelism level gets its own process — exactly like separate
 * spark-submit runs on a real cluster.
 *
 * args: cores imagesPath rep [nRuns]. Prints "CHILDSEC <seconds>".
 */
object BenchChild {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val imagesPath = args(1)
    val rep = args(2).toInt
    val nRuns = if (args.length > 3) args(3).toInt else 3
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench-child")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val input = Bench.headlineInput(s, imagesPath)
    Bench.headline(s, input, 8) // warmup: codegen + JIT
    def run(): Double = {
      val t0 = System.nanoTime()
      Bench.headline(s, input, rep)
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-nRuns; scaling samples use nRuns=1 (replication happens in the
    // parent's interleaved rounds — in-child repeats would triple the wall
    // cost of the long low-core runs without adding independent windows)
    val t = Seq.fill(nRuns)(run()).min
    println(f"CHILDSEC $t%.4f")
    s.stop()
  }
}
