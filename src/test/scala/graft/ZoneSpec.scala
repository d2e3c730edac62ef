package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

import graft.geom.Geom
import graft.ops.{GeoStatsOps, ZoneOps}
import graft.synth.Synth

/** Zone/cell operators (polyfill, compact, overlap areas) + the spatial
  * coverage-gap anti-join, dwell detection, and IDW interpolation — each
  * against an independent in-JVM brute force (and JTS for the clip kernel).
  */
class ZoneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  // ---- clip kernel vs JTS ------------------------------------------------

  test("clipRectArea agrees with JTS intersection area (convex + concave + disjoint)") {
    val gf = new GeometryFactory()
    val rnd = new scala.util.Random(42)
    def jtsArea(ring: Array[Double], latLo: Double, lonLo: Double,
                latHi: Double, lonHi: Double): Double = {
      val n = ring.length / 2
      val coords = (0 until n).map(i => new Coordinate(ring(2 * i), ring(2 * i + 1)))
      val poly = gf.createPolygon((coords :+ coords.head).toArray)
      val rect = gf.createPolygon(Array(
        new Coordinate(lonLo, latLo), new Coordinate(lonHi, latLo),
        new Coordinate(lonHi, latHi), new Coordinate(lonLo, latHi),
        new Coordinate(lonLo, latLo)))
      // OverlayNGRobust: the legacy overlay throws TopologyException on
      // slim sliver intersections even for valid inputs
      org.locationtech.jts.operation.overlayng.OverlayNGRobust
        .overlay(poly, rect, org.locationtech.jts.operation.overlayng.OverlayNG.INTERSECTION)
        .getArea
    }
    // convex polygons: random points on a circle, angle-sorted
    for (_ <- 1 to 60) {
      val nv = 3 + rnd.nextInt(6)
      // star-shaped around the origin: strictly increasing angles with a
      // minimum gap (JTS's overlay cannot node near-degenerate slivers)
      val angles = Array.tabulate(nv)(i =>
        i * 2 * math.Pi / nv + rnd.nextDouble() * (2 * math.Pi / nv - 0.15))
      val ring = angles.flatMap { a =>
        val rad = 0.5 + rnd.nextDouble()
        Array(math.cos(a) * rad, math.sin(a) * rad)
      }
      val (lonLo, latLo) = (rnd.nextDouble() * 2 - 1.5, rnd.nextDouble() * 2 - 1.5)
      val (lonHi, latHi) = (lonLo + rnd.nextDouble() * 1.5, latLo + rnd.nextDouble() * 1.5)
      val got = Geom.clipRectArea(Array(ring), latLo, lonLo, latHi, lonHi)
      val want = jtsArea(ring, latLo, lonLo, latHi, lonHi)
      assert(math.abs(got - want) < 1e-9, s"ring=${ring.mkString(",")}")
    }
    // the concave L-shaped gamma zone at test scale
    val g = Synth.gridSize(spark, dir)
    val gamma = Synth.cityPolys(g).find(_._1 == "gamma").get._2(0)
    for (_ <- 1 to 60) {
      val latLo = 37.0 + rnd.nextDouble() * 0.04
      val lonLo = -122.0 + rnd.nextDouble() * 0.04
      val (latHi, lonHi) = (latLo + rnd.nextDouble() * 0.02, lonLo + rnd.nextDouble() * 0.02)
      val got = Geom.clipRectArea(Array(gamma), latLo, lonLo, latHi, lonHi)
      val want = jtsArea(gamma, latLo, lonLo, latHi, lonHi)
      assert(math.abs(got - want) < 1e-15)
    }
    // fully disjoint rect → 0
    assert(Geom.clipRectArea(Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0)), 5, 5, 6, 6) == 0.0)
  }

  // ---- polyfill + compact ------------------------------------------------

  test("zonalLineLength: Liang–Barsky clip sums agree with JTS line∩rect lengths") {
    import spark.implicits._
    val gf = new GeometryFactory()
    val rnd = new scala.util.Random(7)
    // random segments (incl. axis-aligned and degenerate-direction cases) in
    // a unit-ish degree box, and three random rects as three zones
    val segs = (0 until 200).map { i =>
      val ax = rnd.nextDouble(); val ay = rnd.nextDouble()
      val (bx, by) = rnd.nextInt(4) match {
        case 0 => (ax, rnd.nextDouble())           // vertical
        case 1 => (rnd.nextDouble(), ay)           // horizontal
        case _ => (rnd.nextDouble(), rnd.nextDouble())
      }
      (i.toLong, ax, ay, bx, by)
    }
    val rects = (0 until 3).map { z =>
      val u = Seq(rnd.nextDouble(), rnd.nextDouble()).sorted
      val v = Seq(rnd.nextDouble(), rnd.nextDouble()).sorted
      (s"z$z", u(0), u(1), v(0), v(1))
    }
    val want = rects.map { case (z, latLo, latHi, lonLo, lonHi) =>
      val rect = gf.createPolygon(Array(
        new Coordinate(lonLo, latLo), new Coordinate(lonHi, latLo),
        new Coordinate(lonHi, latHi), new Coordinate(lonLo, latHi),
        new Coordinate(lonLo, latLo)))
      val lens = segs.map { case (_, ax, ay, bx, by) =>
        gf.createLineString(Array(new Coordinate(ay, ax), new Coordinate(by, bx)))
          .intersection(rect).getLength
      }.filter(_ > 0)
      z -> ((lens.length, lens.sum))
    }.toMap
    val got = ZoneOps.zonalLineLength(
        segs.toDF("way_id", "lat1", "lon1", "lat2", "lon2"),
        rects.toDF("zone", "lat_lo", "lat_hi", "lon_lo", "lon_hi"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === want.filter(_._2._1 > 0).keySet)
    got.foreach { case (z, (nSegs, lenNano)) =>
      val (wantN, wantLen) = want(z)
      assert(nSegs === wantN.toLong, s"zone $z seg count")
      // per-segment nano rounding: |Σ| within n·0.5 + float noise of JTS
      assert(math.abs(lenNano - wantLen * 1e9) <= nSegs * 0.5 + 10.0,
        s"zone $z length: got $lenNano want ${wantLen * 1e9}")
    }
    // exact integer case: unit horizontal segment half inside a rect
    val one = ZoneOps.zonalLineLength(
      Seq((1L, 0.0, 0.0, 0.0, 2.0)).toDF("way_id", "lat1", "lon1", "lat2", "lon2"),
      Seq(("h", -1.0, 1.0, 1.0, 3.0)).toDF("zone", "lat_lo", "lat_hi", "lon_lo", "lon_hi"))
      .as[(String, Long, Long)].collect()
    assert(one.toSeq === Seq(("h", 1L, 1000000000L)))
  }

  test("polyfill = brute-force center containment; compact partitions it exactly") {
    import spark.implicits._
    val g = Synth.gridSize(spark, dir)
    val zones = Synth.boundariesDf(spark, g)
      .select(col("name").as("zone"), col("rings"))
    val pf = ZoneOps.polyfill(zones, res = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // brute force over the lattice with the same ray-cast kernel
    val polys = Synth.cityPolys(g)
    val want = (for {
      (name, rings) <- polys.toSeq
      ti <- 0 to 600; tj <- 0 to 600
      cLat = (37000 + ti + 0.5) / 1000.0
      cLon = (-122000 + tj + 0.5) / 1000.0
      if Geom.pointInPolygon(cLat, cLon, rings)
    } yield (name, graft.cells.GridCell.pack(-122000L + tj, 37000L + ti))).toSet
    assert(pf == want)

    // compact: the multi-res set must partition the polyfill exactly
    val cp = ZoneOps.compact(ZoneOps.polyfill(zones, 3), 3, 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val expanded = cp.flatMap {
      case (z, 3, cell) => Seq((z, cell))
      case (z, 2, cell) =>
        val lo = graft.cells.GridCell.unpackLonIdx(cell) * 10
        val la = graft.cells.GridCell.unpackLatIdx(cell) * 10
        for (a <- 0 until 10; b <- 0 until 10)
          yield (z, graft.cells.GridCell.pack(lo + a, la + b))
      case (_, r, _) => fail(s"unexpected res $r")
    }.toSet
    assert(expanded == pf)
    assert(expanded.size == cp.flatMap {
      case (_, 3, _) => Seq(1); case _ => Seq.fill(100)(1)
    }.sum, "parents must not overlap kept cells")

    // idempotence: no complete 10x10 block may remain at res 3
    val keptByParent = cp.filter(_._2 == 3)
      .groupBy(t => (t._1, graft.cells.GridCell.parent(t._3, 3, 2)))
    assert(keptByParent.values.forall(_.length < 100))
  }

  test("cellOverlap areas are exact quarter-microdegree integers that sum to the zone area") {
    val g = Synth.gridSize(spark, dir)
    val zones = Synth.boundariesDf(spark, g)
      .select(col("name").as("zone"), col("rings"))
    val rows = ZoneOps.cellOverlap(zones, res = 3)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val sums = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // whole-zone truth in quarter-µ°²: rect areas from the percent bounds
    val s = (g - 1) * 1000L
    def p(x: Int): Long = s * x / 100
    def rectQ4(uLo: Long, uHi: Long, vLo: Long, vHi: Long): Long =
      (2 * uHi - 2 * uLo) * (2 * vHi - 2 * vLo)
    assert(sums("alpha") == rectQ4(p(10), p(35), p(10), p(40)))
    assert(sums("beta") == rectQ4(p(40), p(70), p(50), p(90)))
    assert(sums("gamma") ==
      rectQ4(p(70), p(95), p(5), p(20)) + rectQ4(p(70), p(80), p(20), p(45)))
  }

  // ---- generic compaction over S2 / Hex7 / quadtree hierarchies -----------

  test("compactS2 partitions the input exactly (expand = original, no complete quads left)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // clustered points so complete quads exist at level 12
    val pts = (1 to 4000).map { _ =>
      (37.0 + rnd.nextInt(50) * 1e-4 + rnd.nextDouble() * 1e-4,
        -122.0 + rnd.nextInt(50) * 1e-4 + rnd.nextDouble() * 1e-4)
    }
    val lvl = 18 // ~38 m cells: the 0.005-degree cloud floods whole quads
    val cellsIn = pts.map(p => graft.cells.S2.fromLatLonAtLevel(p._1, p._2, lvl)).toSet
    val df = cellsIn.toSeq.toDF("cell").withColumn("zone", lit("z"))
    val out = graft.ops.ZoneOps.compactS2(df, lvl, lvl - 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.exists(_._1 < lvl), "no promotion happened — weak test input")
    // expand each output back to its level-lvl descendants via the lsb algebra
    def children(id: Long): Seq[Long] = {
      val lsb = id & -id
      val lc = lsb >> 2
      (0 to 3).map(k => id - lsb + (2 * k + 1) * lc)
    }
    def expand(id: Long, l: Int): Seq[Long] =
      if (l == lvl) Seq(id) else children(id).flatMap(expand(_, l + 1))
    val expanded = out.flatMap { case (l, id) => expand(id, l) }
    assert(expanded.length == expanded.toSet.size, "outputs overlap")
    assert(expanded.toSet == cellsIn, "expand(compact(x)) != x")
    // idempotence: no complete sibling quad remains among kept leaves
    val keptByParent = out.filter(_._1 == lvl)
      .groupBy(t => graft.cells.S2.parentAtLevel(t._2, lvl - 1))
    assert(keptByParent.values.forall(_.length < 4))
  }

  test("compactHex7: a full child set promotes, a 6/7 set does not") {
    import spark.implicits._
    val res = 8
    val parents = Seq(
      graft.cells.Hex7.latLngToCell(37.01, -122.01, res - 1),
      graft.cells.Hex7.latLngToCell(37.30, -121.70, res - 1))
    val full = graft.cells.Hex7.children(parents(0)).toSeq
    val partial = graft.cells.Hex7.children(parents(1)).toSeq.drop(1) // 6 of 7
    val df = (full ++ partial).toDF("cell").withColumn("zone", lit("z"))
    val out = graft.ops.ZoneOps.compactHex7(df, res, res - 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(out == (partial.map((res, _)).toSet + ((res - 1, parents(0)))))
  }

  // ---- extent × zone intersection join ------------------------------------

  test("extentZoneJoin = brute-force rect∩polygon over random extents") {
    import spark.implicits._
    val g = Synth.gridSize(spark, dir)
    val zones = Synth.boundariesDf(spark, g)
      .select(col("name").as("zone"), col("rings"))
    val s = (g - 1) * 1000L
    val rnd = new scala.util.Random(99)
    // random extents: some tiny, some zone-sized, some spanning everything
    val exts = (1 to 120).map { i =>
      val uLo = rnd.nextInt(s.toInt).toLong; val vLo = rnd.nextInt(s.toInt).toLong
      val w = rnd.nextInt(if (i % 3 == 0) s.toInt else 3000) + 1
      (i.toLong, uLo, math.min(s, uLo + w), vLo, math.min(s, vLo + w))
    }
    val got = graft.ops.ZoneOps.extentZoneJoin(
        exts.toDF("id", "uLo", "uHi", "vLo", "vHi"), zones, res = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute force: closed-form half-µ° overlap vs every zone rect
    def p(x: Int): Long = s * x / 100
    val rects = Seq(
      ("alpha", p(10), p(35), p(10), p(40)), ("beta", p(40), p(70), p(50), p(90)),
      ("gamma", p(70), p(95), p(5), p(20)), ("gamma", p(70), p(80), p(20), p(45)))
    val want = (for {
      (id, uLo, uHi, vLo, vHi) <- exts
      (z, ru0, ru1, rv0, rv1) <- rects
      ou = math.max(0L, math.min(2 * uHi, 2 * ru1 + 1) - math.max(2 * uLo, 2 * ru0 + 1))
      ov = math.max(0L, math.min(2 * vHi, 2 * rv1 + 1) - math.max(2 * vLo, 2 * rv0 + 1))
    } yield ((id, z), ou * ov)).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 > 0L).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }

  // ---- coverage gap ------------------------------------------------------

  test("coverageGaps = brute-force 'no segment within maxDist'") {
    val (_, _, wayData) = Pipeline.prepared(spark, dir)
    val streets = wayData.filter(col("way_id") < 2000000L)
    val images = Pipeline.geoImages(spark, dir)
    val maxD = 0.0001505
    val gaps = GeoStatsOps.coverageGaps(images, streets, res = 3, maxDistDeg = maxD)
      .select("image_id").collect().map(_.getString(0)).toSet

    val segs = streets.select(col("geometry")).collect().flatMap { r =>
      val geoms = r.getSeq[org.apache.spark.sql.Row](0)
      geoms.sliding(2).filter(_.length == 2).map(pair =>
        (pair(0).getDouble(0), pair(0).getDouble(1),
          pair(1).getDouble(0), pair(1).getDouble(1)))
    }
    val pts = images.select(col("image_id"), col("lat"), col("lon"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val want = pts.filter { case (_, la, lo) =>
      !segs.exists(s => Geom.pointSegDist(la, lo, s._1, s._2, s._3, s._4) <= maxD)
    }.map(_._1).toSet
    assert(gaps == want)
    assert(gaps.nonEmpty && gaps.size < pts.length)
  }

  // ---- dwell -------------------------------------------------------------

  test("dwellSegments finds exactly the hand-built islands") {
    import spark.implicits._
    // displacements (µ°): steps 1..8 =
    //   [big, small, small, small, big, small, small, big]
    // → one island of 3 (steps 2-4) and one of 2 (steps 6-7)
    val d = Seq(
      (5000, 0), (300, 200), (-400, 100), (0, -500), (3000, -3000),
      (100, 100), (-200, 300), (9000, 0))
    val pts = d.scanLeft((1000000L, 2000000L)) { case ((u, v), (du, dv)) =>
      (u + du, v + dv)
    }
    val geom = pts.map { case (u, v) => (u * 1e-6, v * 1e-6) }
    val df = Seq((7L, geom)).toDF("track_id", "geometry")
      .select(col("track_id"), expr(
        "transform(geometry, p -> struct(p._1 AS lat, p._2 AS lon))").as("geometry"))
    val got3 = GeoStatsOps.dwellSegments(df, epsMicroDeg = 800L, minSteps = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got3 == Set((7L, 2, 4, 3L)))
    val got2 = GeoStatsOps.dwellSegments(df, epsMicroDeg = 800L, minSteps = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got2 == Set((2, 4, 3L), (6, 7, 2L)))
  }

  // ---- apportionment -----------------------------------------------------

  test("apportion = per-cell counts composed with overlap weights; interior zone ≈ PIP count") {
    val g = Synth.gridSize(spark, dir)
    val zones = Synth.boundariesDf(spark, g)
      .select(col("name").as("zone"), col("rings"))
    val pts = Pipeline.geoImages(spark, dir).select(col("lat"), col("lon"))
    val got = ZoneOps.apportion(pts, zones, res = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // independent composition: collected per-cell counts × collected weights
    val w = ZoneOps.cellOverlap(zones, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = pts.withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 3))
      .groupBy("cell").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = w.groupBy(_._1).map { case (z, rows) =>
      z -> (rows.length.toLong,
        rows.map(r => n.getOrElse(r._2, 0L) * r._3).sum)
    }
    assert(got.keySet == Set("alpha", "beta", "gamma"))
    for ((z, (nc, ap)) <- want) {
      assert(got(z)._1 == nc && got(z)._2 == ap, z)
      assert(got(z)._3 == ap * 1000000L / 4000000L, z)
    }
    // sanity: the dasymetric estimate lands near the exact PIP count
    val pipCounts = graft.ops.SpatialOps.imageCity(
        Pipeline.geoImages(spark, dir), Synth.cityPolys(g))
      .groupBy("city").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (z <- Seq("alpha", "beta", "gamma")) {
      val est = got(z)._3 / 1e6
      val exact = pipCounts(z).toDouble
      assert(math.abs(est - exact) / exact < 0.25, s"$z est=$est exact=$exact")
    }
  }

  // ---- streaming geofence ------------------------------------------------

  test("geofenceStream over a 2-batch replay = batch geofenceTransitions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val g = Synth.gridSize(spark, dir)
    val tracks = Synth.tracks(spark, dir).filter(col("track_id") % 17 === 0)
    val want = graft.ops.GeoStatsOps
      .geofenceTransitions(tracks, Synth.cityPolys(g))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    val rows = tracks
      .select(col("track_id"), posexplode(col("geometry")).as(Seq("step", "pt")))
      .select(col("track_id"), col("step"),
        col("pt.lat").as("lat"), col("pt.lon").as("lon"))
      .as[graft.streaming.Streaming.GeoPt].collect()
    // split MID-TRACK so cross-batch state carry (last step/zone) is exercised
    val (b0, b1) = rows.partition(p => p.step < 17)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streaming.GeoPt]
    val q = graft.streaming.Streaming
      .geofenceStream(spark, mem.toDS(), Synth.cityPolys(g))
      .writeStream.format("memory").queryName("zs_stream_geofence")
      .outputMode("append").start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("zs_stream_geofence")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  // ---- IDW ---------------------------------------------------------------

  test("idwInterpolate = brute-force radius-weighted mean (exact integers)") {
    import spark.implicits._
    val probes = Synth.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("probe_id"),
        ((col("o_orderkey") % 1000) * 100).as("u"),
        ((col("o_orderkey") % 997) * 100).as("v"))
    val samples = Pipeline.geoImages(spark, dir)
      .select(col("u"), col("v"), (col("phash") % 1000).as("value"))
    val r = 2000L
    val got = GeoStatsOps.idwInterpolate(probes, samples, r, res = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap

    val ss = samples.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val pp = probes.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = pp.flatMap { case (pid, pu, pv) =>
      val hits = ss.filter { case (su, sv, _) =>
        (su - pu) * (su - pu) + (sv - pv) * (sv - pv) <= r * r
      }
      if (hits.isEmpty) None
      else {
        val ws = hits.map { case (su, sv, v) =>
          val d2 = (su - pu) * (su - pu) + (sv - pv) * (sv - pv)
          (1000000000000L / (1 + d2), v)
        }
        val sw = ws.map(_._1).sum
        Some(pid -> (hits.length.toLong, sw, ws.map(w => w._1 * w._2).sum / sw))
      }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("vectorTiles: hand-derived zigzag varints, continuation bits, negative deltas") {
    import spark.implicits._
    // vertices (u,v): (0,0) → (100,200) → (50,100), all in cell 0
    val geom = Seq((0, 0), (100, 200), (50, 100)).map { case (u, v) =>
      (u * 1e-6, v * 1e-6)
    }
    val df = Seq((7L, geom)).toDF("id", "g")
      .select(col("id"), expr("transform(g, p -> struct(p._1 AS lat, p._2 AS lon))").as("geometry"))
    val row = graft.ops.SpatialOps.vectorTiles(spark, df, 0.0, 0.0).head()
    // deltas (0,0) (100,200) (−50,−100) → zigzag 0,0,200,400,99,199 →
    // varints [0][0][200,1][144,3][99][199,1]
    val bytes = Seq(0, 0, 200, 1, 144, 3, 99, 199, 1)
    val dig = bytes.zipWithIndex.map { case (b, p) =>
      (p + 1L) * (p + 7L) * (b + 17L)
    }.sum
    assert(row.getLong(0) === 0L)   // cell
    assert(row.getLong(2) === 3L)   // n_pts
    assert(row.getLong(3) === bytes.length.toLong)
    assert(row.getLong(4) === dig)
  }

  test("cityFringe: perpendicular distances, nearest-zone tag, first-poly ties, radius cut") {
    import spark.implicits._
    val polys = Array(
      ("A", Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0))), // unit square
      ("B", Array(Array(5.0, 0.0, 6.0, 0.0, 6.0, 1.0, 5.0, 1.0))))
    val pts = Seq(
      ("p1", 0.5, -0.25), // 0.25 left of A
      ("p2", 0.5, 2.0),   // 1.0 right of A (3.0 to B)
      ("p3", 0.5, 3.0),   // EXACT tie: 2.0 to each → first poly A
      ("p4", 0.5, -9.0)   // far outside the 2.5 radius → dropped
    ).toDF("image_id", "lat", "lon")
    val got = graft.ops.SpatialOps.cityFringe(pts, polys, dDeg = 2.5)
      .orderBy("image_id")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("p1", "A", 250000000L),
      ("p2", "A", 1000000000L),
      ("p3", "A", 2000000000L)))
  }
}
