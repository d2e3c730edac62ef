package graft.synth

/** Minimal deterministic 24-bit BMP encoder/decoder (pure Scala, public
  * format spec). Used for the image payload (input_hint fmt='bmp'): encoding
  * is bit-deterministic, so decoded-pixel equality is exact (PSNR = ∞ ≥ 40dB).
  * javax.imageio is used only in tests as the decode oracle.
  */
object Bmp {
  /** Deterministic pixel pattern derived from phash: pixel (x,y) channel c =
    * splitmix of (phash, x, y, c). */
  def pixels(phash: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = phash + x * 0x9e3779b97f4a7c15L + y * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        out(i) = (z & 0xff).toByte
        out(i + 1) = ((z >>> 8) & 0xff).toByte
        out(i + 2) = ((z >>> 16) & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** byte length of a w×h 24-bit BMP produced by [[encode]] — lets frame
    * samplers slice concatenated frames by pure offset arithmetic. */
  def encodedSize(w: Int, h: Int): Int = 54 + ((w * 3 + 3) / 4 * 4) * h

  /** Encode RGB pixels (row-major, 3 bytes/px) as a 24-bit BMP. */
  def encode(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // BMP stores rows bottom-up, BGR order
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        b.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // B,G,R
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Decode a 24-bit BMP back to row-major RGB. */
  def decode(bmp: Array[Byte]): (Array[Byte], Int, Int) = {
    val b = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B' && b.get(1) == 'M', "not a BMP")
    val off = b.getInt(10)
    val w = b.getInt(18)
    val h = b.getInt(22)
    require(b.getShort(28) == 24, "only 24-bit BMP supported")
    // corrupt size fields must fail like any other malformed payload — an
    // unchecked w·h from a bit-flipped header would allocate GBs and die
    // with a FATAL OutOfMemoryError no decode_ok=false path can absorb.
    // The bound is the ACTUAL payload: the buffer must back every pixel row
    // the header claims, so no corrupt-but-"plausible" header can allocate
    // more than ~the payload size (w·h·3 ≤ rowSize·h ≤ bmp.length ≤ 2 GiB),
    // and many concurrent tasks on corrupt records stay memory-bounded.
    require(off >= 0 && w > 0 && h > 0, s"implausible BMP header: off=$off w=$w h=$h")
    val rowSize = ((w.toLong * 3 + 3) / 4 * 4).toInt
    require(w.toLong * 3 + 3 <= Int.MaxValue &&
      off.toLong + rowSize.toLong * h <= bmp.length,
      s"BMP header claims more pixels than the payload backs: " +
        s"off=$off w=$w h=$h len=${bmp.length}")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = off + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        rgb((y * w + x) * 3) = bmp(src + x * 3 + 2)
        rgb((y * w + x) * 3 + 1) = bmp(src + x * 3 + 1)
        rgb((y * w + x) * 3 + 2) = bmp(src + x * 3)
        x += 1
      }
      y += 1
    }
    (rgb, w, h)
  }

  def forPhash(phash: Long, w: Int, h: Int): Array[Byte] = encode(pixels(phash, w, h), w, h)
}
