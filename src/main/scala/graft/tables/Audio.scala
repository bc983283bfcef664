package graft.tables

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Synthetic audio table `(audio_id:string, bytes:binary, sample_rate:int32,
 * n_samples:int32, fmt:string, caption:string)` — the audio leg of the
 * multimodal story. Payloads are REAL RIFF/WAVE PCM16 files written and read
 * through the JDK codec (`javax.sound.sampled.AudioSystem`), mirroring the
 * javax.imageio approach of [[Images]]: samples are a pure function of
 * (clip index, sample index) through the SplitMix64 finalizer, so a DuckDB
 * oracle can re-synthesize every sample and verify the decode path
 * end-to-end (reference analog: opaque binary media columns with typed
 * metadata).
 */
object Audio {

  final case class AudioRow(
      audio_id: String,
      bytes: Array[Byte],
      sample_rate: Int,
      n_samples: Int,
      fmt: String,
      caption: String)

  final val Rate = 8000

  /** Deterministic PCM16 sample: ((hash(i·(2³²+1) + n) >>> 4) % 4001) − 2000. */
  def sampleAt(i: Long, n: Int): Short =
    (((SplitMix64.hash(i * 0x100000001L + n) >>> 4) % 4001L) - 2000L).toShort

  def nSamplesFor(i: Long): Int = (400 + (SplitMix64.hash(i ^ 0x5ca1ab1eL) >>> 8) % 800).toInt

  def samples(i: Long): Array[Short] = {
    val n = nSamplesFor(i)
    Array.tabulate(n)(k => sampleAt(i, k))
  }

  private def pcmFormat(rate: Int): AudioFormat =
    new AudioFormat(rate.toFloat, 16, 1, true /*signed*/, false /*little-endian*/)

  /** Encode PCM16 mono samples as a WAV via the JDK codec. */
  def encodeWav(samps: Array[Short], rate: Int): Array[Byte] = {
    val raw = new Array[Byte](samps.length * 2)
    var k = 0
    while (k < samps.length) {
      raw(k * 2) = (samps(k) & 0xff).toByte
      raw(k * 2 + 1) = ((samps(k) >> 8) & 0xff).toByte
      k += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), pcmFormat(rate), samps.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV via the JDK codec → (rate, PCM16 samples). */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1, s"unexpected wav format: $fmt")
    val raw = ais.readAllBytes()
    val out = new Array[Short](raw.length / 2)
    var k = 0
    while (k < out.length) {
      val lo = raw(k * 2) & 0xff
      val hi = raw(k * 2 + 1).toInt
      out(k) = ((hi << 8) | lo).toShort
      k += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  def row(i: Long): AudioRow = {
    val s = samples(i)
    AudioRow(f"aud$i%012d", encodeWav(s, Rate), Rate, s.length, "wav", Images.caption(i))
  }

  def generate(spark: SparkSession, n: Long): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => row(i)))
  }

  /** Generate-once parquet cache (same idempotent layout rule as Images). */
  def ensureParquet(spark: SparkSession, baseDir: String, tag: String, n: Long): String = {
    val path = s"$baseDir/audio_$tag.parquet"
    val ok = new java.io.File(path, "_SUCCESS").exists()
    if (!ok) {
      generate(spark, n).repartition(16).write.mode("overwrite").parquet(path)
    }
    path
  }

  def rowsForSf(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 30000L
    else if (sfDir.contains("sf0.01")) 3000L
    else 300L
}
