package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Oracle-authoring harness (dev tool, not part of the driver contract):
  * dumps a SELECTED subset of `SparkEntry.queries` + their oracle SQL so a
  * new mirror can be iterated against `tools/check_oracle.py` without paying
  * for the full gate. Usage:
  * `sbt "runMain graft.TmpDrive <sfDir> <outDir> q_a q_b"` then
  * `python3 tools/check_oracle.py <sfDir> <outDir>`. Every new oracle this
  * round went through this loop before entering the gate. */
object TmpDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(s => s"${q(n)}: ${q(s)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
