package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object TmpDrive {
  def main(args: Array[String]): Unit = {
    val names = Seq("q_stream_pip")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try {
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
          .coalesce(1).write.mode("overwrite").parquet(s"/tmp/nq/$n")
        println(s"OK $n")
      } catch { case e: Throwable =>
        println(s"FAIL $n: ${e.getMessage}")
      }
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
    val json = names.filter(SparkEntry.oracleSql.contains)
      .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}")
    Files.writeString(Paths.get("/tmp/nq/oracle_sql.json"), json)
    spark.stop()
  }
}
