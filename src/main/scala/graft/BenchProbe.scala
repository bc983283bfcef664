package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: `runMain graft.BenchProbe <sfDir> q1 q2 ...`
 * (used for plan audits between full bench runs; one warmup, one timed run,
 * noop sink so nothing is written). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_knn", "q_pip_join", "q_calc_group")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup (codegen + JIT) on the smallest SF
    SparkEntry.queries("q_calc_group")(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    names.foreach { q =>
      val t = time {
        SparkEntry.queries(q)(s, sfDir).write.mode("overwrite").format("noop").save()
      }
      println(f"PROBE $q ${t}%.2f sec")
    }
    s.stop()
  }
}
