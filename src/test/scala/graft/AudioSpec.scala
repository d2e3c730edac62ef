package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem
import graft.ops.AudioOps
import graft.synth.{Synth, Wav}

/** WAV codec + audio operators. The independent oracle is the JDK's own
  * javax.sound.sampled RIFF parser — a decoder we did not write. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** decode via the JDK: (interleaved samples, sampleRate, channels). */
  private def jdkDecode(bytes: Array[Byte]): (Array[Short], Int, Int) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleSizeInBits === 16)
    val raw = in.readAllBytes()
    val out = new Array[Short](raw.length / 2)
    for (i <- out.indices)
      out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
    (out, fmt.getSampleRate.toInt, fmt.getChannels)
  }

  test("encode→decode round-trip, mono and interleaved stereo") {
    val mono = Wav.samplesForSeed(42L, 500)
    val (d1, sr1, ch1) = Wav.decode(Wav.encode(mono, 8000, 1))
    assert((sr1, ch1) === ((8000, 1)) && d1.sameElements(mono))
    val stereo = Wav.samplesForSeed(43L, 600) // 300 L/R frames
    val (d2, sr2, ch2) = Wav.decode(Wav.encode(stereo, 16000, 2))
    assert((sr2, ch2) === ((16000, 2)) && d2.sameElements(stereo))
  }

  test("JDK javax.sound parser agrees byte-for-byte with Wav.decode") {
    for (seed <- Seq(1L, 99L, 12345L); sr <- Seq(8000, 16000)) {
      val bytes = Wav.forSeed(seed, sr, 700)
      val (ours, oSr, oCh) = Wav.decode(bytes)
      val (jdk, jSr, jCh) = jdkDecode(bytes)
      assert((oSr, oCh) === ((jSr, jCh)))
      assert(ours.sameElements(jdk))
    }
  }

  test("chunk walk skips unknown chunks (with odd-size padding)") {
    val base = Wav.encode(Wav.samplesForSeed(7L, 100), 8000, 1)
    // splice an unknown 'LIST' chunk of odd size 5 (+1 pad) after 'WAVE'
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // patch RIFF size
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    val (ours, sr, ch) = Wav.decode(spliced)
    val (jdk, jSr, jCh) = jdkDecode(spliced)
    assert((sr, ch) === ((jSr, jCh)))
    assert(ours.sameElements(jdk))
  }

  test("decodeFeatures: all synth clips decode; RMS matches direct computation") {
    val feats = AudioOps.decodeFeatures(spark, Synth.audio(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(feats.nonEmpty && feats.values.forall(_.getBoolean(8)))
    // independent recomputation for one clip (k = 3 → 16 kHz branch)
    val samples = Wav.samplesForSeed(3L * 7919L + 17L, (400 + 3L * 2654435761L % 800L).toInt)
    val rms = math.sqrt(samples.map(s => s.toDouble * s.toDouble).sum / samples.length)
    val row = feats("aud3")
    assert(row.getInt(2) === 16000)
    assert(row.getInt(4) === samples.length)
    assert(row.getLong(6) === math.round(rms * 1000.0))
    assert(row.getInt(7) === samples.map(s => math.abs(s.toInt)).max)
  }

  test("malformed payload yields decode_ok = false, not a crash") {
    import spark.implicits._
    val bad = Seq(("x1", "wav", Array[Byte](1, 2, 3)),
      ("x2", "mp3", "ID3garbagegarbage".getBytes("US-ASCII"))).toDF("audio_id", "fmt", "bytes")
    val rows = AudioOps.decodeFeatures(spark, bad).collect()
    assert(rows.length === 2 && rows.forall(!_.getBoolean(8)))
  }

  test("downsample keeps every k-th frame and emits standalone decodable WAVs") {
    val audio = Synth.audio(spark, "/root/testdata/sf0.001").limit(20)
    val down = AudioOps.downsample(spark, audio, 4).collect()
    val orig = audio.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(down.length === 20)
    down.foreach { r =>
      val (s0, sr0, _) = Wav.decode(orig(r.getString(0)))
      val (s1, sr1, ch1) = Wav.decode(r.getAs[Array[Byte]]("bytes"))
      assert(sr1 === sr0 / 4 && sr1 === r.getInt(2) && ch1 === 1)
      assert(s1.length === (s0.length + 3) / 4)
      assert(s1.indices.forall(i => s1(i) == s0(i * 4)))
      val (jdk, _, _) = jdkDecode(r.getAs[Array[Byte]]("bytes")) // JDK reads it too
      assert(jdk.sameElements(s1))
    }
  }

  test("corrupt payloads: decode paths return failure rows, never throw") {
    import graft.synth.{Bmp, Codec, Wav}
    val good = Bmp.encode(Bmp.pixels(42L, 5, 4), 5, 4)
    // truncation, garbled magic, and an implausible size field all -> None
    assert(Codec.decodeAny("bmp", good.take(10)).isEmpty)
    val garbled = good.clone(); garbled(0) = 'X'.toByte
    assert(Codec.decodeAny("bmp", garbled).isEmpty)
    val hugeDims = good.clone()
    // little-endian width field at offset 18 -> 2^30 (would allocate GBs)
    hugeDims(18) = 0; hugeDims(19) = 0; hugeDims(20) = 0; hugeDims(21) = 64
    assert(Codec.decodeAny("bmp", hugeDims).isEmpty)
    val png = Codec.encodePng(Bmp.pixels(42L, 5, 4), 5, 4)
    assert(Codec.decodeAny("png", png.take(8)).isEmpty)
    assert(Codec.decodeAny("bmp", good).isDefined) // clean still decodes
    // audio: negative/garbage size fields must not escape the failure row
    val wav = Wav.forSeed(7L, 8000, 100)
    val negSize = wav.clone()
    negSize(40) = -1; negSize(41) = -1; negSize(42) = -1; negSize(43) = -1
    intercept[IllegalArgumentException](Wav.decode(negSize)) // size guard fires
    // unknown chunk with NEGATIVE size: pre-guard this moved the cursor
    // BACKWARD onto the same header bytes -> an infinite loop no NonFatal
    // catch could absorb; the central chunk-size guard must throw instead
    val loop = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](-8, -1, -1, -1) ++ new Array[Byte](16)
    intercept[IllegalArgumentException](Wav.decode(loop))
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val df = Seq(("a", "wav", negSize), ("b", "wav", wav.take(10)),
      ("c", "wav", wav)).toDF("audio_id", "fmt", "bytes")
    val rows = graft.ops.AudioOps.decodeFeatures(spark0, df)
      .select("audio_id", "decode_ok").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // ...but the operator absorbs EVERY malformed payload
    assert(rows === Map("a" -> false, "b" -> false, "c" -> true))
  }

  test("frame sampling on a truncated video yields exactly the complete frames") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    import graft.synth.Bmp
    val (w, h, n) = (4, 3, 5)
    val full = (0 until n).map(f => Bmp.encode(Bmp.pixels(f.toLong, w, h), w, h))
      .reduce(_ ++ _)
    val cut = full.take(full.length - 7) // last frame incomplete
    val df = Seq(("v1", "bmp", w, h, n, cut))
      .toDF("video_id", "fmt", "w", "h", "n_frames", "bytes")
    val got = graft.ops.ImageOps.sampleFrames(spark0, df, everyK = 2)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(got === Seq(0, 2)) // frame 4 (sampled) is truncated -> dropped
  }

  test("sceneCuts: identical frames no cut, changed frame cuts, truncated clip yields present pairs") {
    import spark.implicits._
    val w = 4; val h = 3
    val fA = graft.synth.Bmp.encode(Array.fill(w * h * 3)(10.toByte), w, h)
    val fB = graft.synth.Bmp.encode(Array.fill(w * h * 3)(200.toByte), w, h)
    val clip = fA ++ fA ++ fB // pairs: (0,1) sad 0, (1,2) sad 190·36
    val truncated = clip.dropRight(10) // frame 2 incomplete → only pair (0,1)
    val df = Seq(
      ("c1", "bmp", w, h, 3, clip),
      ("c2", "bmp", w, h, 3, truncated))
      .toDF("video_id", "fmt", "w", "h", "n_frames", "bytes")
    val got = graft.ops.ImageOps.sceneCuts(spark, df, cutMilliPerPx = 50000L)
      .collect().map(r => (r.getAs[String]("video_id"), r.getAs[Int]("f1")) ->
        (r.getAs[Long]("sad"), r.getAs[Long]("sad_milli_px"), r.getAs[Boolean]("cut"))).toMap
    assert(got(("c1", 0)) === ((0L, 0L, false)))
    val sad = 190L * w * h * 3
    assert(got(("c1", 1)) === ((sad, sad * 1000 / (3L * w * h), true)))
    assert(!got.contains(("c2", 1)), "truncated frame must not form a pair")
    assert(got(("c2", 0)) === ((0L, 0L, false)))
  }

  test("silenceRuns: hand-built runs — boundary run counts, strict threshold, all-loud/all-silent") {
    import spark.implicits._
    def wav(vs: Seq[Int]) = Wav.encode(vs.map(_.toShort).toArray, 8000, 1)
    // mixed: runs of silent (|v| < 100) lengths 2, 3, then a TRAILING run of 4
    //   → silent_total 9, n_runs(≥3) counts the 3-run and the trailing 4-run,
    //     longest 4; threshold is STRICT (100 is loud, 99 silent)
    val mixed = wav(Seq(0, 50, 100, 99, -99, 0, 100, 5, 5, 5, 5))
    val loud = wav(Seq(32000, -32000, 30000))
    val silent = wav(Seq(0, 1, -1, 2))
    val bad = Array[Byte](1, 2, 3)
    val got = AudioOps.silenceRuns(spark,
        Seq(("m", "wav", mixed), ("l", "wav", loud), ("s", "wav", silent),
          ("x", "wav", bad)).toDF("audio_id", "fmt", "bytes"),
        thresh = 100, minRun = 3)
      .collect().map(r => r.getAs[String]("audio_id") ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("silent_total"),
          r.getAs[Long]("n_runs"), r.getAs[Long]("longest_run"))).toMap
    assert(got("m") === ((11L, 9L, 2L, 4L)))
    assert(got("l") === ((3L, 0L, 0L, 0L)))
    assert(got("s") === ((4L, 4L, 1L, 4L))) // whole clip = one trailing run
    assert(!got.contains("x")) // undecodable drops
  }
}
