package graft.geom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Convex hull + derived exact measures over INTEGER microdegree points
  * (u = lat-offset µ°, v = lon-offset µ°) — the per-cluster geometry
  * kernels of spatial cluster summarization. All arithmetic is Long-exact:
  * cross products of µ° differences stay ≤ ~1e12 and squared diameters
  * ≤ ~1e12, far inside Long range, so every output is engine-reproducible
  * (the driver gate brute-forces the diameter in SQL and must match).
  *
  * Andrew's monotone chain (1979, public): O(n log n) sort + linear chain
  * build, STRICT turns only — collinear boundary points are dropped, so
  * the hull is the minimal vertex set. Degenerate inputs: n=1 → the point,
  * n=2 / all-collinear → the two extreme points.
  *
  * Catalyst adapters take/return array<struct<u:long,v:long>> ArrayData via
  * StaticInvoke (per-GROUP ops — a handful of calls per cluster, not a hot
  * per-row path).
  */
object Hull {

  /** monotone-chain hull over (u, v) pairs; returns hull vertices in
    * counterclockwise order starting from the lexicographic minimum. */
  def hull(us: Array[Long], vs: Array[Long]): (Array[Long], Array[Long]) = {
    val n = us.length
    if (n == 0) return (Array.empty, Array.empty)
    val idx = (0 until n).sortBy(i => (us(i), vs(i))).toArray
    // dedup identical points (collect_list may carry duplicates)
    val ded = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val j = idx(i)
      if (m == 0 || us(ded(m - 1)) != us(j) || vs(ded(m - 1)) != vs(j)) {
        ded(m) = j; m += 1
      }
      i += 1
    }
    if (m == 1) return (Array(us(ded(0))), Array(vs(ded(0))))
    @inline def cross(o: Int, a: Int, b: Int): Long =
      (us(a) - us(o)) * (vs(b) - vs(o)) - (vs(a) - vs(o)) * (us(b) - us(o))
    val st = new Array[Int](2 * m + 1)
    var k = 0
    i = 0
    while (i < m) { // lower chain
      val p = ded(i)
      while (k >= 2 && cross(st(k - 2), st(k - 1), p) <= 0) k -= 1
      st(k) = p; k += 1
      i += 1
    }
    val lower = k + 1
    i = m - 2
    while (i >= 0) { // upper chain
      val p = ded(i)
      while (k >= lower && cross(st(k - 2), st(k - 1), p) <= 0) k -= 1
      st(k) = p; k += 1
      i -= 1
    }
    val h = k - 1 // last point == first point
    (Array.tabulate(h)(j => us(st(j))), Array.tabulate(h)(j => vs(st(j))))
  }

  /** squared diameter (max pairwise squared distance) of a point set — on
    * the HULL vertices only (the max is attained at hull vertices), O(h²)
    * over the tiny hull instead of O(n²) over the cluster. */
  def diam2(us: Array[Long], vs: Array[Long]): Long = {
    var best = 0L
    var i = 0
    while (i < us.length) {
      var j = i + 1
      while (j < us.length) {
        val du = us(i) - us(j); val dv = vs(i) - vs(j)
        val d = du * du + dv * dv
        if (d > best) best = d
        j += 1
      }
      i += 1
    }
    best
  }

  /** TWICE the hull area (shoelace over integer coords — exact Long). */
  def area2(us: Array[Long], vs: Array[Long]): Long = {
    val n = us.length
    if (n < 3) return 0L
    var s = 0L
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      s += us(i) * vs(j) - us(j) * vs(i)
      i += 1
    }
    math.abs(s)
  }

  // ---- Catalyst adapters (array<struct<u:long,v:long>>) -------------------

  private def unpack(arr: ArrayData): (Array[Long], Array[Long]) = {
    val n = arr.numElements()
    val us = new Array[Long](n); val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      us(i) = r.getLong(0); vs(i) = r.getLong(1)
      i += 1
    }
    (us, vs)
  }

  def hullData(arr: ArrayData): ArrayData = {
    val (us, vs) = unpack(arr)
    val (hu, hv) = hull(us, vs)
    new GenericArrayData(
      Array.tabulate[Any](hu.length)(i => InternalRow(hu(i), hv(i))))
  }

  def diam2Data(arr: ArrayData): Long = {
    val (us, vs) = unpack(arr)
    val (hu, hv) = hull(us, vs)
    diam2(hu, hv)
  }

  def area2Data(arr: ArrayData): Long = {
    val (us, vs) = unpack(arr)
    val (hu, hv) = hull(us, vs)
    area2(hu, hv)
  }
}
