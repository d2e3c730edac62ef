package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.simplify.DouglasPeuckerSimplifier
import graft.geom.Geom

/** Douglas-Peucker vs the independent JTS implementation (same published
  * algorithm, same split rule: first interior max, keep when dist >
  * tolerance), plus the simplification invariants. */
class TrajSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val gf = new GeometryFactory()
  private var seed = 1234567L
  private def nxt(): Long = { seed = (seed * 48271 + 11) % 2147483647L; seed }

  private def randomWalk(n: Int): Array[Double] = {
    val flat = new Array[Double](2 * n)
    var lat = 37.0 + (nxt() % 1000).toDouble * 1e-4
    var lon = -122.0 + (nxt() % 1000).toDouble * 1e-4
    flat(0) = lat; flat(1) = lon
    for (i <- 1 until n) {
      lat += ((nxt() % 2001) - 1000).toDouble * 1e-6
      lon += ((nxt() % 2001) - 1000).toDouble * 1e-6
      flat(2 * i) = lat; flat(2 * i + 1) = lon
    }
    flat
  }

  private def viaJts(flat: Array[Double], eps: Double): Array[Double] = {
    val coords = Array.tabulate(flat.length / 2)(i =>
      new Coordinate(flat(2 * i + 1), flat(2 * i))) // x=lon, y=lat
    val simp = DouglasPeuckerSimplifier.simplify(gf.createLineString(coords), eps)
    simp.getCoordinates.flatMap(c => Array(c.y, c.x))
  }

  test("hausdorffPairs: brute-force max-min parity on real tracks; asymmetry surfaces") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val tracks = graft.synth.Synth.tracks(spark, sf)
      .filter(col("track_id") % 50 === 0)
      .select(col("track_id"), col("geometry"))
      .as[(Long, Seq[(Double, Double)])].collect().sortBy(_._1)
    def uv(p: (Double, Double)) =
      (math.round(p._1 * 1e6 - 37.0e6), math.round(p._2 * 1e6 + 122.0e6))
    def h(xs: Seq[(Long, Long)], ys: Seq[(Long, Long)]): Long =
      xs.map { case (xu, xv) =>
        ys.map { case (yu, yv) =>
          (xu - yu) * (xu - yu) + (xv - yv) * (xv - yv) }.min
      }.max
    val want = tracks.sliding(2).collect { case Array((ka, ga), (kb, gb)) =>
      val (pa, pb) = (ga.map(uv), gb.map(uv))
      (ka, kb, h(pa, pb), h(pb, pa))
    }.toSeq.map(t => (t._1, t._2) -> ((t._3, t._4, math.max(t._3, t._4)))).toMap
    val got = graft.ops.GeoStatsOps.hausdorffPairs(
        graft.synth.Synth.tracks(spark, sf), sampleMod = 50L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === want)
    // the directed distances genuinely differ somewhere (asymmetric metric)
    assert(got.values.exists(v => v._1 != v._2))
  }

  test("turnStats: hand-built right-angle/straight/reversal/zero-segment cases + corpus parity") {
    import spark.implicits._
    // build geometry as array<struct<lat,lon>> in µ°-exact doubles
    def track(id: Long, pts: Seq[(Long, Long)]) =
      (id, pts.map { case (u, v) => (u * 1e-6, v * 1e-6) })
    val df = Seq(
      // t1: E, E, N, SW-ish: turns: straight (dot>0, 2dot²>a2b2 → not 45°),
      //     right angle (dot=0 → 90 and 45), reversal-ish
      track(1L, Seq((0L, 0L), (0L, 100L), (0L, 200L), (100L, 200L), (0L, 100L))),
      // t2: zero-length middle segment is skipped
      track(2L, Seq((0L, 0L), (0L, 100L), (0L, 100L), (0L, 200L)))
    ).toDF("track_id", "geometry")
      .withColumn("geometry", expr(
        "transform(geometry, p -> struct(p._1 AS lat, p._2 AS lon))"))
    val got = graft.ops.GeoStatsOps.turnStats(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // t1 turns: (E,E): dot=10000, a2=b2=10000 → 2·1e8 > 1e8 → straight.
    // (E,N): dot=0 → sharp45+sharp90. (N, SW(-100,-100)): dot=-10000 → both.
    assert(got(1L) === ((3L, 2L, 2L)))
    // t2: BOTH turn points touch the zero-length segment → no valid turns,
    // the track emits no row at all (skip contract)
    assert(!got.contains(2L))
    // corpus parity with an in-JVM brute force on real tracks
    val rows = graft.synth.Synth.tracks(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("track_id"), expr(
        "transform(geometry, p -> struct(CAST(round(p.lat*1e6) AS LONG) AS u, CAST(round(p.lon*1e6) AS LONG) AS v))"))
      .as[(Long, Seq[(Long, Long)])].collect()
    val want = rows.map { case (id, pts) =>
      val segs = pts.zip(pts.tail).map { case (a, b) => (b._1 - a._1, b._2 - a._2) }
      val turns = segs.zip(segs.tail).filter { case (a, b) =>
        (a._1 * a._1 + a._2 * a._2) > 0 && (b._1 * b._1 + b._2 * b._2) > 0 }
      val dots = turns.map { case (a, b) =>
        (a._1 * b._1 + a._2 * b._2, a._1 * a._1 + a._2 * a._2, b._1 * b._1 + b._2 * b._2) }
      id -> ((dots.size.toLong,
        dots.count { case (d, a2, b2) => d <= 0 || 2 * d * d <= a2 * b2 }.toLong,
        dots.count(_._1 <= 0).toLong))
    }.toMap
    val got2 = graft.ops.GeoStatsOps.turnStats(
        graft.synth.Synth.tracks(spark, "/root/testdata/sf0.001").limit(50))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got2 === want)
  }

  test("selfIntersections: bowtie crosses, square path doesn't, collinear touch excluded, adjacency skipped") {
    import spark.implicits._
    def track(id: Long, pts: Seq[(Long, Long)]) =
      (id, pts.map { case (u, v) => (u * 1e-6, v * 1e-6) })
    val df = Seq(
      // bowtie: (0,0)→(10,10)→(10,0)→(0,10): segments 0 and 2 cross properly
      track(1L, Seq((0L, 0L), (10L, 10L), (10L, 0L), (0L, 10L))),
      // open square: no crossing
      track(2L, Seq((0L, 0L), (0L, 10L), (10L, 10L), (10L, 0L))),
      // T-touch: segment 2 ENDS on segment 0 (collinear endpoint touch) —
      // proper-only contract excludes it
      track(3L, Seq((0L, 0L), (10L, 0L), (10L, 10L), (5L, 0L))),
      // adjacent segments share a vertex — never counted
      track(4L, Seq((0L, 0L), (10L, 0L), (0L, 1L)))
    ).toDF("track_id", "geometry")
      .withColumn("geometry", expr(
        "transform(geometry, p -> struct(p._1 AS lat, p._2 AS lon))"))
    val got = graft.ops.GeoStatsOps.selfIntersections(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((0L, false)))
    assert(got(4L) === ((0L, false)))
  }

  test("simplifyDp equals JTS DouglasPeuckerSimplifier on 200 random walks") {
    for (t <- 1 to 200) {
      val n = 3 + (nxt() % 60).toInt
      val flat = randomWalk(n)
      val eps = Seq(5e-5, 2e-4, 1e-3)((t % 3))
      val ours = Geom.simplifyDp(flat, eps)
      val jts = viaJts(flat, eps)
      assert(ours.toSeq == jts.toSeq,
        s"walk $t n=$n eps=$eps: ours=${ours.length / 2} jts=${jts.length / 2} pts")
    }
  }

  test("invariants: endpoints kept, kept ⊆ original in order, dropped within eps") {
    for (_ <- 1 to 50) {
      val flat = randomWalk(40)
      val eps = 2e-4
      val simp = Geom.simplifyDp(flat, eps)
      val n = flat.length / 2; val m = simp.length / 2
      assert(simp(0) == flat(0) && simp(1) == flat(1))
      assert(simp(2 * m - 2) == flat(2 * n - 2) && simp(2 * m - 1) == flat(2 * n - 1))
      // kept points appear in the original, in order
      var j = 0
      for (i <- 0 until n if j < m
           if flat(2 * i) == simp(2 * j) && flat(2 * i + 1) == simp(2 * j + 1)) j += 1
      assert(j == m, s"kept sequence not an ordered subset: $j/$m")
      // every original point lies within eps of the simplified line (the
      // DP guarantee for the section containing it)
      for (i <- 0 until n) {
        val d = Geom.pointPolylineDist(flat(2 * i), flat(2 * i + 1), simp)
        assert(d <= eps + 1e-12, s"point $i deviates $d > $eps")
      }
    }
  }

  test("degenerate inputs: 1-2 points unchanged, eps=0 keeps everything non-collinear") {
    assert(Geom.simplifyDp(Array(1.0, 2.0), 1e-3).toSeq == Seq(1.0, 2.0))
    assert(Geom.simplifyDp(Array(1.0, 2.0, 3.0, 4.0), 1e-3).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    val zigzag = Array(0.0, 0.0, 1.0, 1.0, 0.0, 2.0, 1.0, 3.0)
    assert(Geom.simplifyDp(zigzag, 0.0).toSeq == zigzag.toSeq)
    // perfectly collinear interior collapses at any positive eps
    val line = Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0)
    assert(Geom.simplifyDp(line, 1e-9).toSeq == Seq(0.0, 0.0, 3.0, 3.0))
  }

  test("SimplifyPolyline column expression: codegen'd, struct order preserved") {
    val df = Synthetic.tracksDf(spark)
    val out = df.select(col("track_id"),
      graft.exprs.fns.simplify_polyline(col("geometry"), 2e-4).as("simp"))
    val rows = out.orderBy("track_id").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val pts = r.getSeq[org.apache.spark.sql.Row](1)
      assert(pts.length >= 2)
      // lat stays in the walk's band — field order (lat, lon) not swapped
      assert(pts.forall(p => p.getDouble(0) > 30 && p.getDouble(0) < 45))
      assert(pts.forall(p => p.getDouble(1) < -100))
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("simplify_polyline"), plan)
  }

  private object Synthetic {
    def tracksDf(s: org.apache.spark.sql.SparkSession) = {
      import graft.synth.Synth
      // tiny orders stand-in: keys 1..50 through the same track synthesizer
      val dir = "/root/testdata/sf0.001"
      Synth.tracks(s, dir).limit(50)
    }
  }
}
