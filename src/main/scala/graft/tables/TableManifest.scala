package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Iceberg-style table manifest over a parquet directory: one snapshot record
 * per data file with row count and per-column min/max taken from the parquet
 * FOOTER statistics (no data read). `prunedScan` then plans a scan that opens
 * only the files whose stats range intersects the predicate — the
 * metadata-driven file skipping that makes a 10^12-row table queryable
 * without touching most of it (the BASELINE.json "Iceberg table" semantics;
 * plain parquet stands in for the Iceberg format offline).
 */
object TableManifest {

  final case class FileEntry(
      path: String,
      rows: Long,
      stats: Map[String, (Long, Long)]) // col -> (min, max), int64 columns

  final case class Manifest(dir: String, files: Seq[FileEntry]) {
    def totalRows: Long = files.map(_.rows).sum
  }

  /** Build the manifest by reading ONLY parquet footers. */
  def build(dir: String, statCols: Seq[String]): Manifest = {
    val conf = new Configuration()
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val entries = parts.map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val stats = statCols.flatMap { c =>
        val perBlock = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c).flatMap { cc =>
            val st = cc.getStatistics
            if (st == null || !st.hasNonNullValue) None
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) => Some((mn.toLong, mx.toLong))
              case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                Some((mn.toLong, mx.toLong))
              case _ => None
            }
          }
        }
        if (perBlock.isEmpty) None
        else Some(c -> ((perBlock.map(_._1).min, perBlock.map(_._2).max)))
      }.toMap
      reader.close()
      FileEntry(f.getAbsolutePath, rows, stats)
    }
    Manifest(dir, entries.toSeq)
  }

  /** Serialize/load the snapshot (a JSON line per file). */
  def save(m: Manifest, path: String): Unit = {
    val lines = m.files.map { f =>
      val stats = f.stats.map { case (c, (mn, mx)) => s""""$c":[$mn,$mx]""" }.mkString(",")
      s"""{"path":"${f.path}","rows":${f.rows},"stats":{$stats}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (s"""{"dir":"${m.dir}","n_files":${m.files.size}}""" +: lines).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Per-file min/max of an arbitrary DERIVED expression — one distributed
   * pass grouped by input_file_name, for stats parquet footers cannot carry
   * (e.g. the coarse Morton cell group computed from `phash`). This is the
   * Iceberg partition-stats analog for computed partition keys. */
  def buildDerived(spark: SparkSession, dir: String, name: String,
                   derived: org.apache.spark.sql.Column): Manifest = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(dir)
      .select(input_file_name().as("_f"), derived.cast("long").as("_v"))
      .groupBy("_f").agg(count(lit(1)).as("n"), min("_v").as("mn"), max("_v").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    Manifest(dir, rows.sortBy(_._1).map { case (f, n, mn, mx) =>
      FileEntry(f, n, Map(name -> ((mn, mx))))
    }.toIndexedSeq)
  }

  /** Files whose [min, max] for `col` may contain ANY of the wanted values. */
  def pruneFilesForValues(m: Manifest, col: String, wanted: Seq[Long]): Seq[FileEntry] =
    m.files.filter { f =>
      f.stats.get(col) match {
        case Some((mn, mx)) => wanted.exists(v => v >= mn && v <= mx)
        case None => true // no stats: cannot skip
      }
    }

  /** Files whose [min, max] for `col` intersects [lo, hi]. */
  def pruneFiles(m: Manifest, col: String, lo: Long, hi: Long): Seq[FileEntry] =
    m.files.filter { f =>
      f.stats.get(col) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // no stats: cannot skip
      }
    }

  /** Scan planning: read only the surviving files (plus the residual filter —
   * pruning is a superset guarantee, not an exact one). */
  def prunedScan(spark: SparkSession, m: Manifest, col: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val files = pruneFiles(m, col, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(m.dir).filter(c(col) >= lo && c(col) <= hi).limit(0)
    else spark.read.parquet(files.map(_.path): _*)
      .filter(c(col) >= lo && c(col) <= hi)
  }
}
