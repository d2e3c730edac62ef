package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{GeoStatsOps, GraphOps}
import graft.synth.{Codec, Synth}

/** Geospatial statistics: zonal decoded-pixel stats vs a local decode of the
  * same bytes, Gi* hotspots vs a brute-force recompute of the identical
  * double dag, bounded-hop distances vs hand-relaxed Bellman-Ford. */
class GeoStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("zonalImageStats: exact sums/means vs local decode + integer-bounds zoning") {
    val (g, _, _) = Pipeline.prepared(spark, sf)
    val s = (g - 1) * 1000L
    val rows = Pipeline.geoImages(spark, sf, withBytes = true)
      .select("image_id", "fmt", "bytes", "lat", "lon", "phash")
      .as[(String, String, Array[Byte], Double, Double, Long)].collect()

    // mirror of the oracle's integer-microdegree city CASE
    def zone(phash: Long): String = {
      val h1 = phash / 2147483648L
      val h2 = phash % 2147483648L
      def bump(x: Long) = if (x % 500 == 0) x + 13 else x
      val u = bump(h1 % s); val v = bump(h2 % s)
      def p(x: Long) = s * x / 100
      if (u > p(10) && u <= p(35) && v > p(10) && v <= p(40)) "alpha"
      else if (u > p(40) && u <= p(70) && v > p(50) && v <= p(90)) "beta"
      else if ((u > p(70) && u <= p(95) && v > p(5) && v <= p(20)) ||
               (u > p(70) && u <= p(80) && v > p(20) && v <= p(45))) "gamma"
      else "Unincorporated"
    }

    case class Acc(var nImg: Long = 0, var nPx: Long = 0,
                   var r: Long = 0, var gg: Long = 0, var b: Long = 0)
    val accs = scala.collection.mutable.Map.empty[String, Acc]
    rows.filter(t => t._2 == "bmp" || t._2 == "png").foreach {
      case (_, fmt, bytes, _, _, phash) =>
        val Some((rgb, w, h)) = Codec.decodeAny(fmt, bytes)
        val a = accs.getOrElseUpdate(zone(phash), Acc())
        a.nImg += 1; a.nPx += w.toLong * h
        var i = 0
        while (i < rgb.length) {
          a.r += rgb(i) & 0xff; a.gg += rgb(i + 1) & 0xff; a.b += rgb(i + 2) & 0xff
          i += 3
        }
    }
    val got = GeoStatsOps.zonalImageStats(spark,
        Pipeline.geoImages(spark, sf, withBytes = true), Synth.cityPolys(g))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet === accs.keySet)
    assert(got.size === 4) // all three cities + unincorporated present
    accs.foreach { case (z, a) =>
      val (_, nImg, nPx, sr, sg, sb, mr, mg, mb) = got(z)
      assert((nImg, nPx, sr, sg, sb) === ((a.nImg, a.nPx, a.r, a.gg, a.b)), z)
      assert((mr, mg, mb) ===
        ((a.r * 1000000 / a.nPx, a.gg * 1000000 / a.nPx, a.b * 1000000 / a.nPx)), z)
    }
  }

  test("giStarHotspots: z-scores match the brute-force identical double dag; hot tiles rank high") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    val nt = counts.size.toLong
    val sn = counts.values.sum
    val sn2 = counts.values.map(n => n * n).sum
    val want = counts.map { case (t, _) =>
      val nbrs = for {
        du <- -1L to 1L; dv <- -1L to 1L
        nn <- counts.get(t + du * (1L << 26) + dv)
      } yield nn
      val wi = nbrs.size.toLong; val si = nbrs.sum
      // the same dag, term for term
      val xbar = sn.toDouble / nt.toDouble
      val sD = math.sqrt(math.max(0.0, sn2.toDouble / nt.toDouble - xbar * xbar))
      val den = sD * math.sqrt((nt.toDouble * wi.toDouble - wi.toDouble * wi.toDouble) /
        (nt.toDouble - 1.0))
      val z = if (nt > 1 && den > 0.0)
        Some(math.round((si.toDouble - xbar * wi.toDouble) / den * 1000000.0))
      else None
      t -> ((wi, si, z))
    }
    val got = GeoStatsOps.giStarHotspots(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got.size === want.size)
    val bad = want.collect { case (t, w) if got(t) != w => (t, w, got(t)) }
    assert(bad.isEmpty, s"first: ${bad.take(3)}")
    // non-degenerate: the statistic separates hot from cold tiles
    assert(got.values.exists(_._3.exists(_ > 0)))
    assert(got.values.exists(_._3.exists(_ < 0)))
  }

  test("moranI: matches the brute-force sufficient statistics and the identical dag") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    val nt = counts.size.toLong
    val s1 = counts.values.sum
    val s2 = counts.values.map(n => n * n).sum
    var wp = 0L; var p = 0L; var si = 0L
    for ((t, ni) <- counts; du <- -1L to 1L; dv <- -1L to 1L if du != 0 || dv != 0;
         nj <- counts.get(t + du * (1L << 26) + dv)) {
      wp += 1; p += ni * nj; si += ni
    }
    val xbar = s1.toDouble / nt.toDouble
    val den = s2.toDouble - nt.toDouble * xbar * xbar
    val want = math.round(
      (nt.toDouble / wp.toDouble) *
        (p.toDouble - 2.0 * xbar * si.toDouble + wp.toDouble * xbar * xbar) / den * 1000000.0)
    val got = graft.ops.GeoStatsOps.moranI(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(got === ((nt, wp, p, si, s1, s2, Some(want))))
  }

  test("localMoran: per-tile factors/quadrant/magnitude match brute force; locals sum to the global") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    val nt = counts.size.toLong
    val s1 = counts.values.sum
    val s2 = counts.values.map(n => n * n).sum
    val den = nt.toDouble * s2.toDouble - s1.toDouble * s1.toDouble
    val want = counts.map { case (t, ni) =>
      var wI = 0L; var sI = 0L
      for (du <- -1L to 1L; dv <- -1L to 1L if du != 0 || dv != 0;
           nj <- counts.get(t + du * (1L << 26) + dv)) { wI += 1; sI += nj }
      val f1 = ni * nt - s1
      val f2 = sI * nt - wI * s1
      val quad =
        if (wI == 0 || f1 == 0 || f2 == 0) "NA"
        else if (f1 > 0 && f2 > 0) "HH" else if (f1 < 0 && f2 < 0) "LL"
        else if (f1 > 0) "HL" else "LH"
      t -> ((ni, wI, sI, f1, f2, quad,
        math.round(f1.toDouble * f2.toDouble / den * 1000000.0)))
    }
    val got = GeoStatsOps.localMoran(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ)
      .as[(Long, Long, Long, Long, Long, Long, String, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8.get))).toMap
    assert(got === want)
    // decomposition identity: Σ_i f1_i·f2_i / den == (W/N)·I_global / ... in
    // the factored frame, Σ f1 = 0 exactly and locals carry all four quadrants
    assert(counts.map { case (t, ni) => ni * nt - s1 }.sum === 0L)
    assert(got.values.map(_._6).toSet.intersect(Set("HH", "LL")).nonEmpty)
  }

  test("focalStats: 3x3 neighborhood sum/min/max match brute force; self always counted") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    val want = counts.map { case (t, ni) =>
      val nbrs = (for (du <- -1L to 1L; dv <- -1L to 1L;
                       nj <- counts.get(t + du * (1L << 26) + dv)) yield nj)
      t -> ((ni, nbrs.length.toLong, nbrs.sum, nbrs.min, nbrs.max))
    }
    val got = GeoStatsOps.focalStats(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ)
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got === want)
    assert(got.forall { case (_, (n, fn, fs, _, fmax)) =>
      fn >= 1 && fs >= n && fmax >= n })
  }

  test("regionGroup: 4-connected same-class flood fill; min-id labels; isolated tiles self-label") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    def cls(n: Long): Int = if (n < 50) 0 else if (n < 200) 1 else 2
    // brute-force flood fill over same-class 4-adjacency
    val classOf = counts.map { case (t, n) => t -> cls(n) }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (t <- counts.keys.toSeq.sorted if !label.contains(t)) {
      val comp = scala.collection.mutable.Set(t)
      val queue = scala.collection.mutable.Queue(t)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for (d <- Seq(-(1L << 26), 1L << 26, -1L, 1L); v = u + d
             if classOf.contains(v) && classOf(v) == classOf(u) && comp.add(v))
          queue.enqueue(v)
      }
      val root = comp.min
      comp.foreach(c => label(c) = root)
    }
    val want = counts.map { case (t, n) => t -> ((n, cls(n), label(t))) }
    val got = GeoStatsOps.regionGroup(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ, 50L, 200L)
      .as[(Long, Long, Int, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
    // sanity: more than one class and more than one region exist
    assert(got.values.map(_._2).toSet.size > 1)
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("regionStats: per-region size/mass/boundary match the flood-fill brute force") {
    val pts = Pipeline.geoImages(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    val zoomZ = 14
    val tileOf = (lat: Double, lon: Double) =>
      zoomZ.toLong * (1L << 52) +
        graft.geom.Geom.tileX(lon, zoomZ) * (1L << 26) + graft.geom.Geom.tileY(lat, zoomZ)
    val counts = pts.groupBy { case (la, lo) => tileOf(la, lo) }
      .map { case (t, xs) => t -> xs.length.toLong }
    def cls(n: Long): Int = if (n < 50) 0 else if (n < 200) 1 else 2
    val classOf = counts.map { case (t, n) => t -> cls(n) }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (t <- counts.keys.toSeq.sorted if !label.contains(t)) {
      val comp = scala.collection.mutable.Set(t)
      val queue = scala.collection.mutable.Queue(t)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for (d <- Seq(-(1L << 26), 1L << 26, -1L, 1L); v = u + d
             if classOf.contains(v) && classOf(v) == classOf(u) && comp.add(v))
          queue.enqueue(v)
      }
      val root = comp.min
      comp.foreach(c => label(c) = root)
    }
    def boundary(t: Long): Boolean =
      Seq(-(1L << 26), 1L << 26, -1L, 1L).count { d =>
        classOf.get(t + d).contains(classOf(t)) } < 4
    val want = counts.keys.toSeq.groupBy(label).map { case (r, ts) =>
      r -> ((ts.map(classOf).min, ts.size.toLong, ts.map(counts).sum,
        ts.count(boundary).toLong))
    }
    val got = GeoStatsOps.regionStats(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoomZ, 50L, 200L)
      .as[(Long, Int, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === want)
  }

  test("ripleyK: counts equal the quadratic brute force; monotone in r") {
    val rows = Pipeline.geoImages(spark, sf)
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)"), col("u"), col("v"))
      .as[(Long, Long, Long)].collect()
    val radii = Seq(500L, 1000L, 2000L)
    val focals = rows.filter(_._1 % 50 == 0)
    val want = radii.map { r =>
      val c = focals.map { case (fp, fu, fv) =>
        rows.count { case (p, u, v) =>
          p != fp && (u - fu) * (u - fu) + (v - fv) * (v - fv) <= r * r }.toLong
      }.sum
      (r, focals.length.toLong, c, c * 1000L / focals.length)
    }
    val got = GeoStatsOps.ripleyK(
        Pipeline.geoImages(spark, sf).select(
          expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"), col("u"), col("v")),
        radii, res = 3, sampleMod = 50L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.map(_._3).toSeq === got.map(_._3).toSeq.sorted) // monotone in r
  }

  test("nnDistance: hand-placed min/truncation/tie cases + brute-force parity on the corpus") {
    // focals are pid % 2 == 0. pid 0 at (0,0): neighbors (3,4) d2=25 and
    // (10,0) d2=100 → min 25, d_micro 5, n_in_disk 2. pid 2 at (100000,
    // 100000): nothing within R → (0, −1, −1). pid 4 at (500, 0): nearest
    // is pid 1 at (503, 4) d2=25 (pid 0 is d2=250000 — also in disk).
    val pts = Seq(
      (0L, 0L, 0L), (1L, 503L, 4L), (3L, 3L, 4L), (5L, 10L, 0L),
      (2L, 100000L, 100000L), (4L, 500L, 0L))
      .toDF("pid", "u", "v")
    val got = GeoStatsOps.nnDistance(pts, rMicro = 2000L, res = 3, sampleMod = 2L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) === ((4L, 25L, 5L)))
    assert(got(2L) === ((0L, -1L, -1L)))
    assert(got(4L) === ((4L, 25L, 5L)))
    // corpus parity vs the quadratic brute force (disk semantics)
    val rows = Pipeline.geoImages(spark, sf)
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)"), col("u"), col("v"))
      .as[(Long, Long, Long)].collect()
    val want = rows.filter(_._1 % 50 == 0).map { case (fp, fu, fv) =>
      val d2s = rows.collect { case (p, u, v) if p != fp &&
        (u - fu) * (u - fu) + (v - fv) * (v - fv) <= 4000000L =>
        (u - fu) * (u - fu) + (v - fv) * (v - fv) }
      val mind2 = if (d2s.isEmpty) -1L else d2s.min
      (fp, d2s.length.toLong, mind2,
        if (mind2 < 0) -1L else math.floor(math.sqrt(mind2.toDouble)).toLong)
    }.sortBy(_._1).toSeq
    val got2 = GeoStatsOps.nnDistance(
        Pipeline.geoImages(spark, sf).select(
          expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"), col("u"), col("v")),
        rMicro = 2000L, res = 3, sampleMod = 50L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2 === want)
  }

  test("kernelDensity: hand weights, strict support boundary, empty disk; corpus brute-force parity") {
    // focal pid 0 at origin: neighbor at d2=25 → w = R²−25; at d2=R² → ZERO
    // (strict support); pid 2 isolated → (0, 0)
    val r2 = 2000L * 2000L
    val pts = Seq(
      (0L, 0L, 0L), (1L, 3L, 4L), (3L, 2000L, 0L), // d2 = R² exactly
      (2L, 100000L, 100000L))
      .toDF("pid", "u", "v")
    val got = GeoStatsOps.kernelDensity(pts, rMicro = 2000L, res = 3, sampleMod = 2L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) === ((1L, r2 - 25L))) // the boundary point contributes nothing
    assert(got(2L) === ((0L, 0L)))
    // corpus parity vs quadratic brute force
    val rows = Pipeline.geoImages(spark, sf)
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)"), col("u"), col("v"))
      .as[(Long, Long, Long)].collect()
    val want = rows.filter(_._1 % 50 == 0).map { case (fp, fu, fv) =>
      val d2s = rows.collect { case (p, u, v) if p != fp &&
        (u - fu) * (u - fu) + (v - fv) * (v - fv) < r2 =>
        (u - fu) * (u - fu) + (v - fv) * (v - fv) }
      (fp, d2s.length.toLong, d2s.map(r2 - _).sum)
    }.sortBy(_._1).toSeq
    val got2 = GeoStatsOps.kernelDensity(
        Pipeline.geoImages(spark, sf).select(
          expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"), col("u"), col("v")),
        rMicro = 2000L, res = 3, sampleMod = 50L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2 === want)
  }

  test("semivariogramDirectional: brute-force parity incl. sectors; diagonal trend separates directions") {
    val rows = Pipeline.geoImages(spark, sf)
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)"), col("u"), col("v"),
        expr("(u + v) DIV 10 + (phash DIV 2147483648) % 257"))
      .as[(Long, Long, Long, Long)].collect()
    val lags = Seq(1000L, 2000L)
    val acc = scala.collection.mutable.Map[(Long, String), (Long, Long)]()
      .withDefaultValue((0L, 0L))
    for ((fp, fu, fv, fz) <- rows if fp % 50 == 0;
         (p, u, v, z) <- rows if p != fp) {
      val du = math.abs(u - fu); val dv = math.abs(v - fv)
      val d2 = du * du + dv * dv
      val lag = if (d2 > 0 && d2 <= 1000000L) Some(1000L)
        else if (d2 > 1000000L && d2 <= 4000000L) Some(2000L) else None
      lag.foreach { l =>
        val dir = if (du >= 2 * dv) "ns" else if (dv >= 2 * du) "ew" else "diag"
        val (n, s) = acc((l, dir))
        acc((l, dir)) = (n + 1, s + (z - fz) * (z - fz))
      }
    }
    val want = (for (l <- lags; d <- Seq("diag", "ew", "ns")) yield {
      val (n, s) = acc((l, d))
      (l, d, n, s, if (n == 0) 0L else s * 1000L / (2L * n))
    }).sortBy(r => (r._1, r._2))
    val got = GeoStatsOps.semivariogramDirectional(
        Pipeline.geoImages(spark, sf).select(
          expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"),
          col("u"), col("v"),
          expr("(u + v) DIV 10 + (phash DIV 2147483648) % 257").as("value")),
        lagsMicroDeg = lags, res = 3, sampleMod = 50L)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === want)
  }

  test("tileCoverageEntropy: brute-force parity on the corpus; perfectly-even fixture hits evenness ≈ 1e6") {
    def ln9(x: Long): Long = Math.round(math.log(x.toDouble) * 1e9)
    // corpus parity
    val counts = Pipeline.geoImages(spark, sf)
      .select(graft.exprs.fns.tile_id(col("lat"), col("lon"), 14).as("t"))
      .groupBy("t").count().as[(Long, Long)].collect().map(_._2)
    val n = counts.sum; val t = counts.length.toLong
    val ent = n * ln9(n) - counts.map(c => c * ln9(c)).sum
    val pp = ent / n
    val want = (n, t, ent, counts.max,
      1000000L * counts.max / n, pp,
      if (t > 1) 1000000L * pp / ln9(t) else 0L)
    val got = GeoStatsOps.tileCoverageEntropy(
        Pipeline.geoImages(spark, sf).select(col("lat"), col("lon")), zoom = 14)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got === want)
    // perfectly even two-tile fixture: evenness = ln2/ln2 → 1e6 (up to the
    // two-step floor); single-tile → ent 0, evenness 0
    val even = Seq((37.0, -122.0), (37.0, -122.0), (38.5, -100.0), (38.5, -100.0))
      .toDF("lat", "lon")
    val e = GeoStatsOps.tileCoverageEntropy(even, zoom = 14)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(e._1 === 4L && e._2 === 2L)
    assert(e._3 === 4L * ln9(4) - 4L * ln9(2))
    assert(e._7 >= 999998L && e._7 <= 1000000L) // evenness ≈ 1e6
    val single = Seq((37.0, -122.0), (37.0, -122.0)).toDF("lat", "lon")
    val s1 = GeoStatsOps.tileCoverageEntropy(single, zoom = 14)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(s1._3 === 0L && s1._7 === 0L)
  }

  test("semivariogram: matches the quadratic brute force; trend field rises with lag") {
    val rows = Pipeline.geoImages(spark, sf)
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)"), col("u"), col("v"),
        expr("(u + v) DIV 10 + (phash DIV 2147483648) % 257"))
      .as[(Long, Long, Long, Long)].collect()
    val lags = Seq(500L, 1000L, 2000L)
    val bounds = (0L +: lags).zip(lags)
    val focals = rows.filter(_._1 % 50 == 0)
    val want = bounds.map { case (lo, hi) =>
      val prs = for {
        (fp, fu, fv, fz) <- focals
        (p, u, v, z) <- rows
        if p != fp
        d2 = (u - fu) * (u - fu) + (v - fv) * (v - fv)
        if d2 > lo * lo && d2 <= hi * hi
      } yield (z - fz) * (z - fz)
      val (n, s) = (prs.length.toLong, prs.sum)
      (hi, lo, n, s, if (n == 0) 0L else s * 1000L / (2L * n))
    }
    val got = GeoStatsOps.semivariogram(
        Pipeline.geoImages(spark, sf).select(
          expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"),
          col("u"), col("v"),
          expr("(u + v) DIV 10 + (phash DIV 2147483648) % 257").as("value")),
        lags, res = 3, sampleMod = 50L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want)
    // the (u+v) trend dominates the bounded nugget: γ strictly rises
    assert(got.map(_._5).toSeq === got.map(_._5).toSeq.sorted)
    assert(got.last._5 > got.head._5)
  }

  test("odMatrix: endpoint-zone brute force, flow conservation, exact ppm shares") {
    val (g, _, _) = Pipeline.prepared(spark, sf)
    val s = (g - 1) * 1000L
    def zone(u: Long, v: Long): String = {
      def p(x: Long) = s * x / 100
      if (u > p(10) && u <= p(35) && v > p(10) && v <= p(40)) "alpha"
      else if (u > p(40) && u <= p(70) && v > p(50) && v <= p(90)) "beta"
      else if ((u > p(70) && u <= p(95) && v > p(5) && v <= p(20)) ||
               (u > p(70) && u <= p(80) && v > p(20) && v <= p(45))) "gamma"
      else "Unincorporated"
    }
    val tracks = Synth.tracks(spark, sf)
      .select(col("track_id"), col("geometry"))
      .as[(Long, Seq[(Double, Double)])].collect()
    def z(pt: (Double, Double)): String =
      zone(math.round((pt._1 - 37.0) * 1e6), math.round((pt._2 + 122.0) * 1e6))
    val flows = tracks.groupBy { case (_, geom) => (z(geom.head), z(geom.last)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val byOrigin = flows.groupBy(_._1._1).map { case (o, m) => o -> m.values.sum }
    val want = flows.map { case ((f, t), n) =>
      (f, t, n, n * 1000000L / byOrigin(f))
    }.toSet
    val got = GeoStatsOps.odMatrix(Synth.tracks(spark, sf), Synth.cityPolys(g))
      .as[(String, String, Long, Long)].collect()
    assert(got.toSet === want)
    assert(got.map(_._3).sum === tracks.length.toLong) // every track counted once
    got.groupBy(_._1).foreach { case (_, rows) =>       // shares ≈ 1e6 per origin
      val tot = rows.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - rows.length)
    }
  }

  test("tileRepresentative: exactly the lexicographic (phash, id) min per occupied tile") {
    val rows = Pipeline.geoImages(spark, sf)
      .select("image_id", "phash", "lat", "lon")
      .as[(String, Long, Double, Double)].collect()
    val tileOf = (lat: Double, lon: Double) =>
      15L * (1L << 52) +
        graft.geom.Geom.tileX(lon, 15) * (1L << 26) + graft.geom.Geom.tileY(lat, 15)
    val want = rows.groupBy { case (_, _, la, lo) => tileOf(la, lo) }
      .map { case (t, xs) =>
        val m = xs.minBy(r => (r._2, r._1)); t -> ((m._1, m._2))
      }
    val got = graft.ops.ClusterOps.tileRepresentative(
        Pipeline.geoImages(spark, sf).select(
          col("image_id"), col("phash"), col("lat"), col("lon")), 15)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
  }

  test("geofenceTransitions: matches per-track zone replay; enters and exits both occur") {
    val (g, _, _) = Pipeline.prepared(spark, sf)
    val s = (g - 1) * 1000L
    def zone(u: Long, v: Long): String = {
      def p(x: Long) = s * x / 100
      if (u > p(10) && u <= p(35) && v > p(10) && v <= p(40)) "alpha"
      else if (u > p(40) && u <= p(70) && v > p(50) && v <= p(90)) "beta"
      else if ((u > p(70) && u <= p(95) && v > p(5) && v <= p(20)) ||
               (u > p(70) && u <= p(80) && v > p(20) && v <= p(45))) "gamma"
      else "Unincorporated"
    }
    val tracks = Synth.tracks(spark, sf)
      .select(col("track_id"), col("geometry"))
      .as[(Long, Seq[(Double, Double)])].collect()
    val want = tracks.flatMap { case (tid, geom) =>
      val zones = geom.map { case (la, lo) =>
        zone(math.round((la - 37.0) * 1e6), math.round((lo + 122.0) * 1e6))
      }
      zones.sliding(2).zipWithIndex.collect {
        case (Seq(a, b), i) if a != b => (tid, i + 1, a, b)
      }
    }.toSet
    val got = graft.ops.GeoStatsOps.geofenceTransitions(
        Synth.tracks(spark, sf), Synth.cityPolys(g))
      .as[(Long, Int, String, String)].collect().toSet
    assert(got === want)
    assert(got.exists(_._4 != "Unincorporated")) // enters happen
    assert(got.exists(_._3 != "Unincorporated")) // exits happen
  }

  test("boundedDistances: hand-relaxed Bellman-Ford on a known graph, hop bound honored") {
    // 1 → 2 (w 10) → 3 (w 1); 1 → 3 (w 100); 3 → 5 (w 2); 4 never appears
    val e = Seq((1L, 2L, 10L), (2L, 3L, 1L), (1L, 3L, 100L), (3L, 5L, 2L))
      .toDF("src", "dst", "w")
    val twoHop = GraphOps.boundedDistances(e, Seq(1L).toDF("id"), hops = 2)
      .as[(Long, Long)].collect().toMap
    // within 2 hops: 3 via the direct heavy edge OR 1→2→3 = 11; 5 only via
    // the 2-hop-reachable heavy route 1→3→5 = 102 (the cheap path needs 3)
    assert(twoHop === Map(1L -> 0L, 2L -> 10L, 3L -> 11L, 5L -> 102L))
    val threeHop = GraphOps.boundedDistances(e, Seq(1L).toDF("id"), hops = 3)
      .as[(Long, Long)].collect().toMap
    // the third round relaxes 5 down to 1→2→3→5 = 13
    assert(threeHop === Map(1L -> 0L, 2L -> 10L, 3L -> 11L, 5L -> 13L))
  }

  test("boundedPaths: distances match boundedDistances; preds are the (dist, pred) argmin") {
    // 1 → 2 (w 10) → 3 (w 1); 1 → 3 (w 100); 3 → 5 (w 2); plus 0 → 3 (w 11)
    // so node 3 has TWO equal-cost 2-hop paths (pred 0 vs pred 2 at dist 11)
    // — the lexicographic tie-break must keep pred 0
    val e = Seq((1L, 2L, 10L), (2L, 3L, 1L), (1L, 3L, 100L), (3L, 5L, 2L),
        (0L, 3L, 11L))
      .toDF("src", "dst", "w")
    val got = GraphOps.boundedPaths(e, Seq(0L, 1L).toDF("id"), hops = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      0L -> ((0L, -1L)), 1L -> ((0L, -1L)), 2L -> ((10L, 1L)),
      3L -> ((11L, 0L)), // tie at 11: pred 0 < pred 2
      5L -> ((13L, 3L))))
    // distances agree with the dist-only operator on the same input
    val dOnly = GraphOps.boundedDistances(e, Seq(0L, 1L).toDF("id"), hops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.view.mapValues(_._1).toMap === dOnly)
  }
}
