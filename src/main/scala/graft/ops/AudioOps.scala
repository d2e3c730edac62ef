package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.synth.Wav

/** Audio (binary) column operators — the audio leg of the multimodal brief,
  * same partition-batched typed-island shape as ImageOps. Unlike the stubbed
  * non-BMP image codecs, WAV decode is fully REAL: a RIFF chunk walk + PCM16
  * read (graft.synth.Wav), cross-checked in tests against the JDK's
  * independent javax.sound.sampled parser.
  *
  * Features are integer-valued (duration ms, RMS in milli-units, peak) so
  * aggregate pins are bit-stable across runs and engines.
  */
object AudioOps {

  case class AudioFeatures(
      audio_id: String, fmt: String, sample_rate: Int, channels: Int,
      n_samples: Int, duration_ms: Long, rms_milli: Long, peak: Int,
      decode_ok: Boolean)

  /** decode + loudness feature extraction. rms_milli is round(1000 * RMS) of
    * the raw 16-bit amplitudes; peak is max |sample|. Non-WAV payloads (or
    * malformed RIFF) yield decode_ok = false with zeroed features — the
    * honest analog of the image-side stub, except nothing here is faked. */
  def decodeFeatures(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select("audio_id", "fmt", "bytes")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes) =>
          try {
            val (samples, sr, ch) = Wav.decode(bytes)
            var sumSq = 0.0
            var peak = 0
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toInt
              sumSq += v.toDouble * v.toDouble
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            val nFrames = samples.length / ch
            val rms = if (samples.length == 0) 0.0 else math.sqrt(sumSq / samples.length)
            AudioFeatures(id, fmt, sr, ch, nFrames,
              nFrames.toLong * 1000L / sr, math.round(rms * 1000.0), peak,
              decode_ok = true)
          } catch {
            // NonFatal, not a named pair: a negative RIFF size field throws
            // NegativeArraySizeException, garbage offsets IndexOutOfBounds —
            // any malformed payload must land in the decode_ok=false row,
            // never kill the job
            case scala.util.control.NonFatal(_) =>
              AudioFeatures(id, fmt, 0, 0, 0, 0L, 0L, 0, decode_ok = false)
          }
        }
      }.toDF()
  }

  /** Silence / low-energy run detection (the trim-silence + voice-activity
    * pre-pass of an audio pipeline): maximal runs of consecutive samples
    * with |v| < thresh, reported per clip as total silent samples, number
    * of runs of length ≥ minRun, and the longest run. Pure integers —
    * every statistic is a BIGINT a gaps-and-islands SQL oracle reproduces
    * exactly. One map-side decode pass; 6 scalars per clip shuffle,
    * samples never travel. Undecodable payloads drop (the
    * q_media_decode_robust gate owns that contract). */
  def silenceRuns(spark: SparkSession, audio: DataFrame,
                  thresh: Int = 16384, minRun: Int = 4): DataFrame = {
    import spark.implicits._
    audio.select("audio_id", "bytes")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val (samples, sr, _) = Wav.decode(bytes)
            var i = 0; var cur = 0L; var total = 0L
            var runs = 0L; var longest = 0L
            while (i < samples.length) {
              if (math.abs(samples(i).toInt) < thresh) {
                cur += 1; total += 1
                if (cur > longest) longest = cur
              } else {
                if (cur >= minRun) runs += 1
                cur = 0
              }
              i += 1
            }
            if (cur >= minRun) runs += 1
            Some((id, sr, samples.length.toLong, total, runs, longest))
          } catch {
            case scala.util.control.NonFatal(_) => None
          }
        }
      }.toDF("audio_id", "sample_rate", "n_samples", "silent_total",
        "n_runs", "longest_run")
  }

  /** integer-factor downsample (every `factor`-th frame kept), re-encoded as
    * a standalone WAV at sampleRate/factor. Real end-to-end: the output is a
    * valid RIFF file the decoder (ours or the JDK's) reads back. Like the
    * video frame sampler, dropped frames are never copied anywhere. */
  def downsample(spark: SparkSession, audio: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    require(factor >= 1, "factor must be >= 1")
    audio.select("audio_id", "bytes")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val (samples, sr, ch) = Wav.decode(bytes)
            val nFrames = samples.length / ch
            val kept = new Array[Short]((nFrames + factor - 1) / factor * ch)
            var f = 0; var o = 0
            while (f < nFrames) {
              var c = 0
              while (c < ch) { kept(o) = samples(f * ch + c); o += 1; c += 1 }
              f += factor
            }
            Some((id, Wav.encode(kept, sr / factor, ch), sr / factor))
          } catch {
            // NonFatal, not a named pair: a negative RIFF size field throws
            // NegativeArraySizeException, garbage offsets IndexOutOfBounds —
            // any malformed payload must land in the decode_ok=false row,
            // never kill the job
            case scala.util.control.NonFatal(_) => None
          }
        }
      }.toDF("audio_id", "bytes", "sample_rate")
  }
}
