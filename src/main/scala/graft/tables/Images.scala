package graft.tables

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.cell.CellIndex

/**
 * The engine's primary input table (schema fixed by BASELINE.json:15):
 * `(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
 * caption:string, phash:int64)` — Parquet standing in for Iceberg (no Iceberg
 * jar ships offline; the layout is partition-friendly so a real catalog can be
 * swapped in).
 *
 * Geolocation is derived deterministically from `phash`: the low 52 bits are a
 * Morton interleave of two 26-bit cell coordinates, decoded to (lon, lat) in
 * the planar [0,100)² test domain. This keeps the hinted schema untouched while
 * giving every image a stable location (FIXTURES.md §B.1).
 *
 * Payloads are REAL encoded images (javax.imageio PNG/JPEG), rendered from a
 * seeded PRNG so decode / PSNR parity checks exercise true codecs
 * (reference raster model: `/root/reference/src/rasters/mapshaper-image-import.mjs:21-47`).
 */
object Images {

  final case class ImageRow(
      image_id: String,
      bytes: Array[Byte],
      w: Int,
      h: Int,
      fmt: String,
      caption: String,
      phash: Long)

  private val captionVocab: Array[String] = Array(
    "aerial", "view", "of", "the", "coast", "river", "city", "mountain",
    "forest", "road", "bridge", "field", "island", "harbor", "valley", "lake")

  /** Deterministic caption from an image index: 4-8 vocab words. */
  def caption(i: Long): String = {
    val rng = new SplitMix64(i * 31 + 7)
    val n = 4 + rng.nextInt(5)
    (0 until n).map(_ => captionVocab(rng.nextInt(captionVocab.length))).mkString(" ")
  }

  final val LocBits = 26
  final val LocScale = 100.0 / (1L << LocBits).toDouble

  /** phash for image index i: Morton-packed 26+26-bit location + id entropy. */
  def phashFor(i: Long): Long = {
    val hx = SplitMix64.hash(i * 2 + 1) & ((1L << LocBits) - 1)
    val hy = SplitMix64.hash(i * 2 + 2) & ((1L << LocBits) - 1)
    (CellIndex.interleave(hx) << 1) | CellIndex.interleave(hy)
  }

  /** Morton-decode a phash to (lon, lat) in [0,100)². */
  def lonLat(phash: Long): (Double, Double) = (lonOf(phash), latOf(phash))

  /** Primitive single-value forms — called from codegen'd expressions. */
  def lonOf(phash: Long): Double = CellIndex.deinterleave(phash >>> 1) * LocScale
  def latOf(phash: Long): Double = CellIndex.deinterleave(phash) * LocScale

  /** Render a deterministic RGB image for index i. */
  def render(i: Long, w: Int, h: Int): BufferedImage = {
    val rng = new SplitMix64(i)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // gray gradient + low-amplitude noise. Grayscale keeps chroma constant,
        // so 4:2:0 subsampling is exact and the PSNR >= 40 dB invariant holds
        // even for 8x8 thumbnails; luma quantization at q=0.97 stays > 40 dB.
        val g = ((x * 160 / w) + (y * 80 / h) + rng.nextInt(4)) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (fmt == "jpeg" || fmt == "jpg") {
      // explicit high quality: the PSNR >= 40 dB per-row invariant must hold
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.97f)
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose()
      ios.close()
    } else {
      ImageIO.write(img, fmt, bos)
    }
    bos.toByteArray
  }

  /** Decode bytes to (w, h, packed RGB pixels). Real codec path. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    (w, h, px)
  }

  /** PSNR (dB) between two packed-RGB pixel arrays; Infinity if identical. */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "pixel count mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      var c = 0
      while (c < 3) {
        val d = ((a(i) >> (8 * c)) & 0xff) - ((b(i) >> (8 * c)) & 0xff)
        se += d.toDouble * d
        c += 1
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / (a.length * 3.0)))
  }

  /** Build one deterministic row. */
  def row(i: Long): ImageRow = {
    val rng = new SplitMix64(i ^ 0x5deece66dL)
    val w = 8 + rng.nextInt(25)
    val h = 8 + rng.nextInt(25)
    val fmt = if (rng.nextInt(4) == 0) "jpeg" else "png"
    val img = render(i, w, h)
    ImageRow(f"img$i%012d", encode(img, fmt), w, h, fmt, caption(i), phashFor(i))
  }

  /** Distributed deterministic generation of n rows. */
  def generate(spark: SparkSession, n: Long): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => row(i)))
  }

  /**
   * Generate-once cache: images parquet for a scale tag under `baseDir`.
   * Returns the parquet path. Deterministic, so regeneration is idempotent.
   */
  def ensureParquet(spark: SparkSession, baseDir: String, tag: String, n: Long): String = {
    val path = s"$baseDir/images_$tag.parquet"
    val ok = new java.io.File(path, "_SUCCESS").exists()
    if (!ok) {
      // fixed partition count: identical file layout no matter which session
      // (or parallelism level) generated the cache
      generate(spark, n)
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Rows for a given scale-factor directory name (sf0.001 / sf0.01 / sf0.1). */
  def rowsForSf(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 120000L
    else if (sfDir.contains("sf0.01")) 12000L
    else 1200L
}
