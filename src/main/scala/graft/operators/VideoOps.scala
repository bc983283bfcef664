package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.{Images, Video}

/**
 * Frame sampling + per-frame features over opaque GVID `bytes` columns —
 * the video counterpart of [[Multimodal]]: shuffle-free `mapPartitions`,
 * container seek (no full decode), each SAMPLED frame through the real
 * javax.imageio PNG codec. Downstream sees only narrow rows
 * (video_id, frame, ahash, mean) — `bytes` never enters an exchange.
 */
object VideoOps {

  /** Every `stride`-th frame decoded to (video_id, frame, ahash, mean_g_int).
    * mean_g_int = floor(mean green × 1000) — exact for lossless frames. */
  def sampleFrames(spark: SparkSession, video: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    video.select("video_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val n = Video.frameCount(bytes)
        (0 until n by stride).iterator.map { f =>
          val (w, h, px) = Images.decode(Video.frame(bytes, f))
          var sg = 0L
          var k = 0
          while (k < px.length) { sg += (px(k) >> 8) & 0xff; k += 1 }
          (id, f.toLong, Multimodal.ahash(px, w, h),
            math.floor(sg.toDouble / (w * h) * 1000.0).toLong)
        }
      })
      .toDF("video_id", "frame", "ahash", "mean_g_int")
  }
}
