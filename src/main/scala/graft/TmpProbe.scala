package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: pure-compute Spark CPU cost vs core count (no cache, no
 * shuffle) to localize the headline's 8-core CPU inflation. Deleted after
 * use. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def job(n: Long): Unit = {
      s.range(0, n, 1, cores * 8).select(xxhash64(col("id")).as("h"))
        .agg(bit_xor(col("h"))).collect()
      ()
    }
    job(200000000L) // warmup JIT+codegen
    val c0 = mx.getProcessCpuTime; val t0 = System.nanoTime()
    job(4000000000L)
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (mx.getProcessCpuTime - c0) / 1e9
    println(f"PROBE cores=$cores wall=$wall%.3f cpu=$cpu%.3f occ=${cpu / wall}%.2f")
    s.stop()
  }
}
