package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.tables.Audio

/**
 * Audio feature extraction and segment editing over opaque WAV `bytes`
 * columns — the audio counterpart of [[Multimodal]]: shuffle-free
 * `mapPartitions` over the payload, every decode through the real JDK codec.
 * Downstream aggregations see only narrow integer features; `bytes` never
 * enters an exchange.
 */
object AudioOps {

  final case class AudioFeatures(
      audio_id: String,
      sample_rate: Int,
      n_samples: Int,
      duration_ms: Long,
      zero_crossings: Long,
      peak: Int,
      energy: Long)

  /** Per-clip integer features (exactly mirrorable): zero crossings, peak
    * amplitude, total energy Σ s², duration. */
  def features(spark: SparkSession, audio: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.select("audio_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, s) = Audio.decodeWav(bytes)
        var zc = 0L
        var peak = 0
        var energy = 0L
        var k = 0
        while (k < s.length) {
          val v = s(k).toInt
          if (k > 0 && ((s(k - 1) < 0) != (v < 0))) zc += 1
          val a = math.abs(v)
          if (a > peak) peak = a
          energy += v.toLong * v
          k += 1
        }
        AudioFeatures(id, rate, s.length, s.length.toLong * 1000L / rate, zc, peak, energy)
      })
  }

  /** Middle-half segment extraction re-encoded through the codec: decode →
    * slice [n/4, n/4 + n/2) → WAV encode → decode again (the full
    * round-trip inside the verified loop, like image augmentation). Output
    * is the segment's exact energy + bounds. */
  def middleSegment(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select("audio_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, s) = Audio.decodeWav(bytes)
        val from = s.length / 4
        val len = s.length / 2
        val seg = java.util.Arrays.copyOfRange(s, from, from + len)
        val (rate2, back) = Audio.decodeWav(Audio.encodeWav(seg, rate))
        var energy = 0L
        var k = 0
        while (k < back.length) {
          energy += back(k).toLong * back(k)
          k += 1
        }
        (id, from.toLong, back.length.toLong, energy, rate2)
      })
      .toDF("audio_id", "seg_from", "seg_len", "seg_energy", "sample_rate")
  }
}
