package graft.cells

/** S2 cell ids from scratch (public algorithm: cube-face projection +
  * quadratic ST transform + per-level Hilbert curve ordering; layout
  * face(3 bits) · Hilbert position(2·level bits) · 1-sentinel, 64-bit).
  * No S2 library ships in this environment — this is a clean-room
  * implementation of the published bit layout, tested via exact
  * (face,i,j) round-trips and structural invariants (S2Spec).
  */
object S2 {
  val MaxLevel = 30
  private val SwapMask = 1
  private val InvertMask = 2

  // Hilbert quadrant orderings per orientation (public S2 tables)
  private val ijToPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 3, 1, 2), // axes swapped
    Array(2, 3, 1, 0), // bits inverted
    Array(2, 1, 3, 0)) // swapped & inverted
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 2, 3, 1),
    Array(3, 2, 0, 1),
    Array(3, 1, 0, 2))
  private val posToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  /** lat/lon degrees → unit xyz. */
  @inline private def toXyz(latDeg: Double, lonDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val c = math.cos(lat)
    (c * math.cos(lon), c * math.sin(lon), math.sin(lat))
  }

  /** xyz → (face, u, v) cube projection. */
  def faceUv(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val face =
      if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
      else if (ay >= az) { if (y >= 0) 1 else 4 }
      else { if (z >= 0) 2 else 5 }
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case 5 => (5, -y / z, -x / z)
    }
  }

  /** quadratic ST transform (the S2_QUADRATIC_PROJECTION published curve). */
  @inline def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u) else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)
  @inline def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1) else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  @inline private def stToIj(s: Double): Int = {
    val ij = (s * (1 << MaxLevel)).toInt
    math.max(0, math.min((1 << MaxLevel) - 1, ij))
  }

  /** leaf cell id from (face, i, j) — per-level Hilbert walk. */
  def fromFaceIj(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orientation = face & SwapMask
    var level = 0
    while (level < MaxLevel) {
      val iBit = (i >> (MaxLevel - 1 - level)) & 1
      val jBit = (j >> (MaxLevel - 1 - level)) & 1
      val q = ijToPos(orientation)((iBit << 1) | jBit)
      pos = (pos << 2) | q
      orientation ^= posToOrientation(q)
      level += 1
    }
    (face.toLong << 61) | (pos << 1) | 1L
  }

  /** inverse: leaf cell id → (face, i, j). */
  def toFaceIj(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    val pos = (id >>> 1) & ((1L << 60) - 1)
    var orientation = face & SwapMask
    var i = 0; var j = 0
    var level = 0
    while (level < MaxLevel) {
      val q = ((pos >> (2 * (MaxLevel - 1 - level))) & 3L).toInt
      val ij = posToIJ(orientation)(q)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= posToOrientation(q)
      level += 1
    }
    (face, i, j)
  }

  /** leaf cell id of a lat/lon. */
  def fromLatLon(latDeg: Double, lonDeg: Double): Long = {
    val (x, y, z) = toXyz(latDeg, lonDeg)
    val (face, u, v) = faceUv(x, y, z)
    fromFaceIj(face, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** id truncated to `level` (standard lsb arithmetic). */
  def parentAtLevel(id: Long, level: Int): Long = {
    val newLsb = 1L << (2 * (MaxLevel - level))
    (id & -newLsb) | newLsb
  }

  /** leaf id → cell id at `level` (encode-then-truncate). */
  def fromLatLonAtLevel(latDeg: Double, lonDeg: Double, level: Int): Long =
    parentAtLevel(fromLatLon(latDeg, lonDeg), level)

  def level(id: Long): Int = MaxLevel - java.lang.Long.numberOfTrailingZeros(id) / 2

  /** center lat/lon of a cell id (inverse projection; used by tests). */
  def toLatLon(id: Long): (Double, Double) = {
    val lv = level(id)
    val (face, i, j) = toFaceIj(id)
    // center of the cell at this level
    val size = 1 << (MaxLevel - lv)
    val si = (i & ~(size - 1)) + size / 2
    val sj = (j & ~(size - 1)) + size / 2
    val u = stToUv(si.toDouble / (1 << MaxLevel))
    val v = stToUv(sj.toDouble / (1 << MaxLevel))
    val (x, y, z) = face match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case 5 => (v, u, -1.0)
    }
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    val lon = math.toDegrees(math.atan2(y, x))
    (lat, lon)
  }
}
