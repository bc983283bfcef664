package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Plan/timing capture for declared queries OUTSIDE the 13-query bench list
 * (BenchExtra covers those). Same session configs as BenchExtra; used for
 * the round-6 plans of oracle-path queries touched by an optimization
 * (e.g. q_ann_ivf). Usage:
 *   sbt "runMain graft.PlanDump <tag> <query> [query...]"
 * Writes plans/r06/<query>_<tag>.txt and prints min-of-3 noop-sink seconds.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      s.sparkContext.setJobDescription(name)
      val df = fn(s, sfDir)
      Files.write(planDir.resolve(s"${name}_$tag.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          .getBytes(StandardCharsets.UTF_8))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(s, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val t = Seq.fill(3)(once()).min
      println(f"PLANDUMP $name tag=$tag min3=$t%.3f s")
    }
    s.stop()
  }
}
