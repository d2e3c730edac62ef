package graft.synth

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real WAV (RIFF) codec: 16-bit PCM, mono or stereo. Encode writes
  * the canonical 44-byte header; decode does a proper RIFF chunk walk (magic
  * check, fmt/data discovery, unknown chunks skipped with even-byte padding)
  * so it accepts WAVs from any standard writer, not only its own. Used as
  * the real (non-stub) audio decode path in AudioOps; tests cross-check it
  * against the JDK's independent javax.sound.sampled parser.
  */
object Wav {

  /** deterministic PCM: splitmix-style LCG stream seeded per clip. */
  def samplesForSeed(seed: Long, nSamples: Int): Array[Short] = {
    val out = new Array[Short](nSamples)
    var s = seed
    var i = 0
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 48).toShort
      i += 1
    }
    out
  }

  def forSeed(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] =
    encode(samplesForSeed(seed, nSamples), sampleRate, channels = 1)

  /** canonical RIFF/WAVE/fmt/data layout, 16-bit little-endian PCM.
    * For channels == 2 the samples array is interleaved L,R,L,R…. */
  def encode(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels must be 1|2: $channels")
    require(samples.length % channels == 0, "interleaved length must divide channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** (interleaved samples, sampleRate, channels). Throws on non-RIFF input
    * or non-16-bit-PCM fmt — callers map that to decode_ok = false. */
  def decode(bytes: Array[Byte]): (Array[Short], Int, Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF file")
    buf.getInt // riff size (trust chunk walk, not this)
    require(tag4() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var channels = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8 && (data == null || sampleRate < 0)) {
      val id = tag4()
      val size = buf.getInt
      // ONE guard for every branch: a negative size would move the cursor
      // BACKWARD on the skip paths — an infinite loop no NonFatal catch can
      // absorb — and an oversized one reads past the buffer or allocates
      // GBs (fatal OOM) on the data path
      require(size >= 0 && size <= buf.remaining(),
        s"bad chunk size $size for '$id' (${buf.remaining()} bytes remain)")
      id match {
        case "fmt " =>
          val fmtStart = buf.position()
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not integer PCM: fmt tag $audioFormat")
          channels = buf.getShort.toInt
          // 0 channels would reach `samples.length / ch` as /0 downstream —
          // ArithmeticException is NOT in callers' decode_ok=false catch list
          require(channels >= 1 && channels <= 2, s"channels must be 1|2: $channels")
          sampleRate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(bits == 16, s"only 16-bit PCM supported: $bits")
          buf.position(fmtStart + size + (size & 1)) // skip extension + pad
        case "data" =>
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = buf.getShort; i += 1 }
          data = s
          buf.position(buf.position() + (size & 1))
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // skip unknown chunk
      }
    }
    require(sampleRate > 0 && data != null, "missing fmt or data chunk")
    (data, sampleRate, channels)
  }
}
