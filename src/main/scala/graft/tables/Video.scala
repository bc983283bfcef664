package graft.tables

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Synthetic video table `(video_id:string, bytes:binary, w:int32, h:int32,
 * n_frames:int32, fps:int32, caption:string)` — the video leg of the
 * multimodal story. The container is a deliberately simple seekable format
 * ("GVID": magic, frame count, offset table, concatenated PNG frames): the
 * frame PAYLOADS go through the real javax.imageio PNG codec, so
 * frame-sampling exercises a true decode path, while the container itself
 * stays trivially parseable (the charter's "stub the exotic codec, make the
 * Spark plumbing real" rule — here only the container is bespoke, the codec
 * is real).
 *
 * Frame f of video i renders the deterministic [[Images.render]] pattern
 * with seed i·100000 + f, so every sampled frame's content is re-derivable
 * by a SQL oracle.
 */
object Video {

  final case class VideoRow(
      video_id: String,
      bytes: Array[Byte],
      w: Int,
      h: Int,
      n_frames: Int,
      fps: Int,
      caption: String)

  final val Magic = 0x47564944 // "GVID"

  def frameSeed(i: Long, frame: Int): Long = i * 100000L + frame

  def dimsFor(i: Long): (Int, Int) = {
    val rng = new SplitMix64(i ^ 0x7e57ab1eL)
    (8 + rng.nextInt(25), 8 + rng.nextInt(25))
  }

  def nFramesFor(i: Long): Int = (4 + (SplitMix64.hash(i ^ 0xf4a3eL) >>> 7) % 5).toInt

  /** Pack PNG frame blobs into a GVID container. */
  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val headerLen = 8 + 4 * frames.length
    val total = headerLen + frames.map(_.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putInt(frames.length)
    var off = headerLen
    frames.foreach { f => buf.putInt(off); off += f.length }
    frames.foreach(buf.put)
    buf.array()
  }

  /** Number of frames in a container without decoding any frame. */
  def frameCount(bytes: Array[Byte]): Int = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic, "not a GVID container")
    buf.getInt()
  }

  /** Extract the k-th frame blob (no full-container decode). */
  def frame(bytes: Array[Byte], k: Int): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic, "not a GVID container")
    val n = buf.getInt()
    require(k >= 0 && k < n, s"frame $k of $n")
    val off = buf.getInt(8 + 4 * k)
    val end = if (k + 1 < n) buf.getInt(8 + 4 * (k + 1)) else bytes.length
    java.util.Arrays.copyOfRange(bytes, off, end)
  }

  def row(i: Long): VideoRow = {
    val (w, h) = dimsFor(i)
    val n = nFramesFor(i)
    val frames = (0 until n).map(f =>
      Images.encode(Images.render(frameSeed(i, f), w, h), "png"))
    VideoRow(f"vid$i%012d", pack(frames), w, h, n, 10, Images.caption(i))
  }

  def generate(spark: SparkSession, n: Long): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => row(i)))
  }

  def ensureParquet(spark: SparkSession, baseDir: String, tag: String, n: Long): String = {
    val path = s"$baseDir/video_$tag.parquet"
    val ok = new java.io.File(path, "_SUCCESS").exists()
    if (!ok) {
      generate(spark, n).repartition(16).write.mode("overwrite").parquet(path)
    }
    path
  }

  def rowsForSf(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 12000L
    else if (sfDir.contains("sf0.01")) 1200L
    else 120L
}
