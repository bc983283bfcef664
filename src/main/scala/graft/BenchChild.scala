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
      // AQE off for the FIXED bench pipeline: no join to re-plan, no skew to
      // split — its only effect here is per-stage barrier/re-plan serial
      // time, which biases the measured scaling ceiling downward (the
      // serial component is billed equally to every parallelism level)
      .config("spark.sql.adaptive.enabled",
        sys.props.getOrElse("graft.bench.aqe", "false"))
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
    // host-wide busy/steal CPU-seconds from /proc/stat (USER_HZ=100) — the
    // child measures its OWN window so the contamination accounting aligns
    // exactly with the measured run, not with JVM startup/warmup
    def hostBusySteal(): (Double, Double) =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val f = src.getLines().next().trim.split("\\s+")
          val busy = (f(1).toDouble + f(2).toDouble + f(3).toDouble +
            (if (f.length > 6) f(6).toDouble + f(7).toDouble else 0.0)) / 100.0
          val steal = if (f.length > 8) f(8).toDouble / 100.0 else 0.0
          (busy, steal)
        } finally src.close()
      } catch { case _: Throwable => (-1.0, -1.0) }
    def selfCpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    // Frequency probe: per-thread retire rate of a REGISTER-ONLY spin
    // (multiply/xor, zero memory traffic, Spark-free) with `cores` threads
    // active — directly measures the physical host's effective clock in
    // this window. Measured on this sandbox: the rate swings >20% minute
    // to minute with /proc/stat steal ~0 and no co-tenant VM CPU
    // ("frequency steal" by other tenants of the physical host, invisible
    // to every in-VM counter), while 2 vs 8 active threads differ <3%
    // within one window. The parent divides it out of the scaling ratio:
    // cluster-size scaling (the contract being evidenced) adds NODES, and
    // adding nodes does not change anyone's clock.
    def spinRate(threads: Int): Double = {
      val iters = 600000000L
      val secs = new Array[Double](threads)
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until threads).map { k =>
        new Thread(() => {
          var x = 0x9E3779B97F4A7C15L ^ k.toLong
          var i = 0L
          val t0 = System.nanoTime()
          while (i < iters) { x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33); i += 1 }
          secs(k) = (System.nanoTime() - t0) / 1e9
          sink.addAndGet(x)
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      if (sink.get() == 42L) println("") // keep the loop alive
      iters / (secs.sum / threads) / 1e6 // Miters/s per thread
    }
    spinRate(cores) // JIT the spin loop itself
    // min-of-nRuns; scaling samples use nRuns=1 (replication happens in the
    // parent's interleaved rounds — in-child repeats would triple the wall
    // cost of the long low-core runs without adding independent windows)
    val cal0 = spinRate(cores)
    val (hb0, hs0) = hostBusySteal()
    val c0 = selfCpu()
    val w0 = System.nanoTime()
    val t = Seq.fill(nRuns)(run()).min
    val wall = (System.nanoTime() - w0) / 1e9
    val (hb1, hs1) = hostBusySteal()
    val c1 = selfCpu()
    val cal1 = spinRate(cores)
    println(f"CHILDSEC $t%.4f")
    // wall, host busy CPU-sec, host steal CPU-sec, own CPU-sec over the
    // measured window — the parent derives other-process CPU (co-tenant
    // contamination loadavg and steal both miss) as busy - self
    // BOTH window brackets must have read successfully — a failed end read
    // would print garbage negative deltas that the parent's max(0, ·)
    // clamps into a false "clean, nothing measured" verdict
    if (hb0 >= 0 && c0 >= 0 && hb1 >= 0 && c1 >= 0)
      println(f"CHILDSTAT $wall%.4f ${hb1 - hb0}%.4f ${hs1 - hs0}%.4f ${c1 - c0}%.4f")
    // clock probe bracketing the measured run (Miters/s/thread before/after)
    println(f"CHILDCAL $cal0%.1f $cal1%.1f")
    s.stop()
  }
}
