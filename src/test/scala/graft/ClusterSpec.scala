package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ClusterOps

/** Spatial clustering + curation: DBSCAN against an in-JVM brute-force
  * reference, per-tile cap invariants, pyramid mass conservation. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the registered query uses eps=60 m, tuned to sf0.01 density (945 core /
  // 481 border / 13,574 noise there); at the spec's sf0.001 the same radius
  // yields zero cores, so the spec exercises the operator at eps=100 m where
  // all three roles appear (786 core / 273 border / 441 noise, max comp 7)
  private val Eps = 100.0
  private val MinPts = 4

  private lazy val pts: Array[(Long, Double, Double)] =
    Pipeline.geoImages(spark, "/root/testdata/sf0.001")
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"),
        col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)

  private def hav(aLat: Double, aLon: Double, bLat: Double, bLon: Double): Double = {
    val dLat = math.toRadians(bLat - aLat) / 2
    val dLon = math.toRadians(bLon - aLon) / 2
    val h = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(aLat)) * math.cos(math.toRadians(bLat)) *
        math.sin(dLon) * math.sin(dLon)
    2 * 6371008.8 * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** textbook DBSCAN, brute force, with the same deterministic tie rules:
    * cluster id = min core id of the component, border joins min cluster. */
  private def reference(): Map[Long, (Long, String, Option[Long])] = {
    val n = pts.length
    val nbrs = Array.fill(n)(List.empty[Int])
    for (i <- 0 until n; j <- 0 until n
         if hav(pts(i)._2, pts(i)._3, pts(j)._2, pts(j)._3) <= Eps)
      nbrs(i) ::= j // includes self
    val core = (0 until n).filter(nbrs(_).size >= MinPts).toSet
    // union-find over core-core edges
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (ri, rj) = (find(i), find(j)); if (ri != rj) parent(ri) = rj
    }
    val clusterOf: Map[Int, Long] = core.groupBy(find)
      .flatMap { case (_, members) =>
        val label = members.map(pts(_)._1).min
        members.map(_ -> label)
      }
    (0 until n).map { i =>
      val id = pts(i)._1
      if (core(i)) id -> (nbrs(i).size.toLong, "core", Some(clusterOf(i)))
      else {
        val coreNbrClusters = nbrs(i).filter(j => core(j) && j != i).map(clusterOf)
        if (coreNbrClusters.nonEmpty)
          id -> (nbrs(i).size.toLong, "border", Some(coreNbrClusters.min))
        else id -> (nbrs(i).size.toLong, "noise", None)
      }
    }.toMap
  }

  test("dbscan matches the brute-force reference exactly (roles, labels, counts)") {
    val got = ClusterOps.dbscan(
        pts.toSeq.toDF("pid", "lat", "lon"), Eps, MinPts)
      .as[(Long, Long, String, Option[Long])].collect()
      .map { case (pid, nEps, role, cl) => pid -> ((nEps, role, cl)) }.toMap
    val want = reference()
    assert(got.size === want.size)
    val mismatches = want.collect { case (id, w) if got(id) != w => (id, w, got(id)) }
    assert(mismatches.isEmpty, s"first mismatches: ${mismatches.take(5)}")
    // the scenario actually exercises all three roles
    val roles = got.values.map(_._2).toSet
    assert(roles === Set("core", "border", "noise"))
  }

  test("capPerTile: ≤cap rows per tile, deterministic keep set, stable priorities") {
    val df = pts.toSeq.toDF("pid", "lat", "lon")
    val kept = ClusterOps.capPerTile(df, zoom = 15, cap = 16)
      .as[(Long, Long, Long, Int)].collect()
    val byTile = kept.groupBy(_._2)
    assert(byTile.values.forall(_.length <= 16))
    // keep set = the 16 smallest (priority, pid) per tile, recomputed locally
    val local = pts.map { case (pid, lat, lon) =>
      val tile = 15L * (1L << 52) +
        graft.geom.Geom.tileX(lon, 15) * (1L << 26) + graft.geom.Geom.tileY(lat, 15)
      (pid, tile, java.lang.Math.floorMod(pid * 2654435761L, 4294967296L))
    }
    val expect = local.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(16).map(_._1)
    }.toSet
    assert(kept.map(_._1).toSet === expect)
    // some tile is actually over the cap (the test is non-vacuous)
    assert(local.groupBy(_._2).values.exists(_.length > 16))
  }

  test("kmeans: exact match vs in-JVM Lloyd with identical init/tie/update rules") {
    val (g, _, _) = Pipeline.prepared(spark, "/root/testdata/sf0.001")
    val s = (g - 1) * 1000L
    val uv = Pipeline.geoImages(spark, "/root/testdata/sf0.001")
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"),
        col("u"), col("v"))
      .as[(Long, Long, Long)].collect()

    val k = 8; val iters = 3
    var cents: IndexedSeq[(Long, Long)] = (0 until k).map { j =>
      ((2L * (j % 4) + 1) * s / 8, (2L * (j / 4) + 1) * s / (k / 2))
    }
    def assign(cs: IndexedSeq[(Long, Long)]) = uv.map { case (pid, u, v) =>
      val best = cs.zipWithIndex.minBy { case ((cu, cv), j) =>
        ((u - cu) * (u - cu) + (v - cv) * (v - cv), j)
      }
      (pid, best._2, best._1._1, best._1._2)
    }
    var want = assign(cents)
    for (_ <- 2 to iters) {
      val byC = want.groupBy(_._2)
      cents = cents.zipWithIndex.map { case (prev, j) =>
        byC.get(j).fold(prev) { rows =>
          val ids = rows.map(_._1).toSet
          val pts = uv.filter(t => ids(t._1))
          (pts.map(_._2).sum / pts.length, pts.map(_._3).sum / pts.length)
        }
      }
      want = assign(cents)
    }
    val got = graft.ops.ClusterOps.kmeans(
        uv.toSeq.toDF("pid", "u", "v"), s, k, iters)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === want.length)
    val wantMap = want.map(t => t._1 -> ((t._2.toLong, t._3, t._4))).toMap
    val bad = got.filter(t => wantMap(t._1) != ((t._2, t._3, t._4)))
    assert(bad.isEmpty, s"first: ${bad.take(3).toSeq}")
    // non-degenerate: the rounds actually moved centroids and populated >1 cluster
    assert(got.map(_._2).distinct.length > 1)
  }

  test("tilePyramid: leaf mass = point count, every level conserves mass, parents aggregate children") {
    val df = pts.toSeq.toDF("pid", "lat", "lon")
    val pyr = ClusterOps.tilePyramid(df.select("lat", "lon"), leafZoom = 15, minZoom = 11)
      .as[(Int, Long, Long)].collect()
    val byZoom = pyr.groupBy(_._1)
    assert(byZoom.keySet === Set(11, 12, 13, 14, 15))
    byZoom.values.foreach(level => assert(level.map(_._3).sum === pts.length.toLong))
    // per-parent check at one level: z14 tile n = sum of its z15 children
    val z15 = byZoom(15).map { case (_, t, cnt) => (t, cnt) }
    val parentOf = (t: Long) =>
      14L * (1L << 52) + ((t % (1L << 52)) / (1L << 26) / 2) * (1L << 26) + (t % (1L << 26)) / 2
    val rolled = z15.groupBy { case (t, _) => parentOf(t) }
      .map { case (p, kids) => (p, kids.map(_._2).sum) }
    val z14 = byZoom(14).map { case (_, t, cnt) => (t, cnt) }.toMap
    assert(rolled === z14)
    // coarser levels genuinely merge tiles
    assert(byZoom(11).length < byZoom(15).length)
  }

  test("spatialSplit: leakage-free (no train tile touches a test tile), deterministic, all classes present") {
    val points = Pipeline.geoImages(spark, "/root/testdata/sf0.001")
      .select(expr("CAST(substring(image_id, 4) AS BIGINT)").as("pid"),
        col("lat"), col("lon"))
    // z17 at sf0.001: ~200 occupied tiles (z15 would give ~12 — too few
    // for all three classes); the hash is deterministic so classes are fixed
    val zoom = 17
    val got = ClusterOps.spatialSplit(points, zoom, testMod = 10)
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._3).toSet === Set("test", "buffer", "train"))
    // leakage freedom: Chebyshev distance between any train tile and any
    // test tile is >= 2 (the buffer absorbed the 3x3 ring)
    def txy(t: Long): (Long, Long) = ((t % (1L << 52)) / (1L << 26), t % (1L << 26))
    val testT = got.filter(_._3 == "test").map(t => txy(t._2)).distinct
    val trainT = got.filter(_._3 == "train").map(t => txy(t._2)).distinct
    for ((ax, ay) <- trainT; (bx, by) <- testT)
      assert(math.max(math.abs(ax - bx), math.abs(ay - by)) >= 2,
        s"train tile ($ax,$ay) touches test tile ($bx,$by)")
    // tile-keyed: every tile maps to exactly one split
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
    // partitioning-invariant
    val got32 = ClusterOps.spatialSplit(points.repartition(32), zoom, testMod = 10)
      .orderBy("pid").as[(Long, Long, String)].collect().toSeq
    assert(got.sortBy(_._1) === got32)
  }

  test("Hull.hull = JTS convex hull; diam2/area2 exact vs brute force") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 80) {
      val n = 1 + rnd.nextInt(40)
      val us = Array.fill(n)(rnd.nextInt(2000).toLong)
      val vs = Array.fill(n)(rnd.nextInt(2000).toLong)
      val (hu, hv) = graft.geom.Hull.hull(us, vs)
      // hull vertex set == JTS hull vertex set (JTS also drops collinear)
      val jts = gf.createMultiPointFromCoords(
        us.indices.map(i => new Coordinate(us(i).toDouble, vs(i).toDouble)).toArray)
        .convexHull()
      val jtsSet = jts.getCoordinates.map(c => (c.x.toLong, c.y.toLong)).toSet
      val gotSet = hu.indices.map(i => (hu(i), hv(i))).toSet
      assert(gotSet == jtsSet, s"trial $trial")
      // diameter on hull == brute force over ALL points
      val bf = (for (i <- 0 until n; j <- i until n) yield {
        val du = us(i) - us(j); val dv = vs(i) - vs(j); du * du + dv * dv
      }).max
      assert(graft.geom.Hull.diam2(hu, hv) == bf, s"trial $trial diam")
      // area parity with JTS (hull area is exact integer/2 on lattice pts)
      assert(graft.geom.Hull.area2(hu, hv) == math.round(jts.getArea * 2), s"trial $trial area")
    }
    // degenerate: single point, duplicates, collinear
    assert(graft.geom.Hull.hull(Array(5L), Array(7L))._1.toSeq == Seq(5L))
    val (cu, cv) = graft.geom.Hull.hull(Array(0L, 1L, 2L, 1L), Array(0L, 1L, 2L, 1L))
    assert(cu.toSeq.sorted == Seq(0L, 2L) && cv.toSeq.sorted == Seq(0L, 2L))
    assert(graft.geom.Hull.diam2(cu, cv) == 8L)
    assert(graft.geom.Hull.area2(cu, cv) == 0L)
  }

  test("clusterHullStats two-level (salted) path = direct single-group truth") {
    val rnd = new scala.util.Random(13)
    val members = (for (c <- 1 to 5; _ <- 1 to (20 + rnd.nextInt(200))) yield
      (c.toLong, rnd.nextInt(5000).toLong, rnd.nextInt(5000).toLong))
    val df = members.toDF("cluster", "u", "v")
    val got = ClusterOps.clusterHullStats(df, nSalts = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toMap
    for ((c, rows) <- members.groupBy(_._1)) {
      val us = rows.map(_._2).toArray; val vs = rows.map(_._3).toArray
      val (hu, hv) = graft.geom.Hull.hull(us, vs)
      val bf = (for (i <- us.indices; j <- us.indices) yield {
        val du = us(i) - us(j); val dv = vs(i) - vs(j); du * du + dv * dv
      }).max
      val (nm, nh, d2, a2) = got(c)
      assert(nm == rows.length)
      assert(nh == hu.length)
      assert(d2 == bf)
      assert(a2 == graft.geom.Hull.area2(hu, hv))
    }
  }
}
