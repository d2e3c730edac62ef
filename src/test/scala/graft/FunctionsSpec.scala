package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cells.{GridCell, Hex7, S2}
import graft.plans.GraftPlans

/** graft_* SQL function surface: same Catalyst expressions as
  * graft.exprs.fns, reachable from spark.sql strings. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("scalar functions evaluate identically to the fns builders") {
    GraftPlans.enable(spark)
    val r = spark.sql(
      """SELECT graft_cell_encode(37.51D, -122.17D, 2)  AS cell,
        |       graft_s2_cell(37.51D, -122.17D, 12)     AS s2,
        |       graft_hex7_cell(37.51D, -122.17D, 9)      AS hex7,
        |       graft_haversine_m(37.0D, -122.0D, 37.1D, -122.0D) AS hm,
        |       graft_clean_street_key('Main St_3')     AS ck,
        |       graft_cell_parent(graft_cell_encode(37.51D, -122.17D, 3), 3, 1) AS par
        |""".stripMargin).head()
    assert(r.getLong(0) === GridCell.encode(37.51, -122.17, 2))
    assert(r.getLong(1) === S2.fromLatLonAtLevel(37.51, -122.17, 12))
    assert(r.getLong(2) === Hex7.latLngToCell(37.51, -122.17, 9))
    assert(math.abs(r.getDouble(3) - graft.geom.Geom.haversineM(37.0, -122.0, 37.1, -122.0)) < 1e-9)
    assert(r.getString(4) === "Main St")
    assert(r.getLong(5) === GridCell.parent(GridCell.encode(37.51, -122.17, 3), 3, 1))
  }

  test("table-valued use over a view, including array-returning functions") {
    GraftPlans.enable(spark)
    import spark.implicits._
    Seq((37.001, -121.999), (37.201, -121.799)).toDF("lat", "lon")
      .createOrReplaceTempView("pts")
    val rows = spark.sql(
      """SELECT graft_tile_id(lat, lon, 15) AS t,
        |       size(graft_cells_covering(lat, lon, lat + 0.02D, lon + 0.02D, 2)) AS nc,
        |       size(graft_cell_disk(graft_cell_encode(lat, lon, 2), 2, 2)) AS nd
        |FROM pts""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getInt(1) === 9))  // 0.02° bbox at 0.01° cells → 3×3
    assert(rows.forall(_.getInt(2) === 25)) // Chebyshev disk k=2 → 5×5
  }

  test("graft_gmap_url / cell_disk_rect: F13 padded string + rect disk sizes") {
    GraftPlans.enable(spark)
    import spark.implicits._
    Seq((38.810724, -119.793042)).toDF("lat", "lon").createOrReplaceTempView("gpt")
    val r = spark.sql(
      """SELECT graft_gmap_url(lat, lon) AS u,
        |       size(graft_cell_disk_rect(graft_cell_encode(lat, lon, 3), 4, 1, 3)) AS nr
        |FROM gpt""".stripMargin).collect()(0)
    // reference offset.js:133-137: `   ${lat},${lon}  ` verbatim
    assert(r.getString(0) === "   38.810724,-119.793042  ")
    // JS prints integral doubles without '.0' — `${-120.0}` is '-120'
    val integral = spark.sql("SELECT graft_gmap_url(38.5D, -120.0D)").collect()(0).getString(0)
    assert(integral === "   38.5,-120  ")
    // property sweep: random fix6 coords (incl. forced integral, sub-1e-3
    // near-equator/meridian, and -0.0 ones) match JS template semantics
    // computed by an INDEPENDENT oracle: shortest-round-trip digits found
    // via printf %.*e (vs the impl's BigDecimal MathContext rounding), then
    // ECMA plain-decimal assembly from the exponent string
    def jsRepr(x: Double): String = {
      if (x == 0.0) return "0" // JS `${-0}` is "0"
      val ax = math.abs(x)
      var p = 0
      var s = String.format("%.0e", Double.box(ax))
      while (s.toDouble != ax && p < 17) { p += 1; s = String.format(s"%.${p}e", Double.box(ax)) }
      val Array(mant, expS) = s.split("e")
      val digits = mant.replace(".", "").reverse.dropWhile(_ == '0').reverse
      val n = expS.toInt + 1 // decimal-point position: value = 0.digits * 10^n
      val k = digits.length
      val body =
        if (n >= k) digits + "0" * (n - k)
        else if (n > 0) digits.substring(0, n) + "." + digits.substring(n)
        else "0." + ("0" * (-n)) + digits
      if (x < 0) "-" + body else body
    }
    assert(jsRepr(0.0001) === "0.0001") // Java Double.toString blind spot: "1.0E-4"
    assert(jsRepr(-0.0) === "0")        // and "-0.0"
    val rnd = new scala.util.Random(7)
    val coords = (0 until 300).map { i =>
      def fix6(v: Double) = math.round(v * 1e6) / 1e6
      val la = if (i % 9 == 0) (rnd.nextInt(181) - 90).toDouble
               else if (i % 9 == 4) fix6((rnd.nextDouble() * 2 - 1) * 1e-3) // sub-1e-3 band
               else if (i % 9 == 7) -0.0
               else fix6(-90 + rnd.nextDouble() * 180)
      val lo = if (i % 7 == 0) (rnd.nextInt(361) - 180).toDouble
               else if (i % 7 == 3) fix6((rnd.nextDouble() * 2 - 1) * 1e-4)
               else fix6(-180 + rnd.nextDouble() * 360)
      (la, lo)
    }
    import spark.implicits._
    val got = coords.toDF("la", "lo")
      .select(graft.exprs.fns.gmap_url(org.apache.spark.sql.functions.col("la"),
        org.apache.spark.sql.functions.col("lo"))).as[String].collect()
    coords.zip(got).foreach { case ((la, lo), g) =>
      assert(g === s"   ${jsRepr(la)},${jsRepr(lo)}  ", s"($la,$lo)")
    }
    assert(r.getInt(1) === 9 * 3) // (2·4+1)×(2·1+1)
    val dfSide = Seq((38.810724, -119.793042)).toDF("lat", "lon")
      .select(graft.exprs.fns.gmap_url(org.apache.spark.sql.functions.col("lat"),
        org.apache.spark.sql.functions.col("lon"))).collect()(0).getString(0)
    assert(dfSide === "   38.810724,-119.793042  ")
  }

  test("static parameters reject non-literal arguments with a clear error") {
    GraftPlans.enable(spark)
    import spark.implicits._
    Seq((37.0, -122.0, 2)).toDF("lat", "lon", "r").createOrReplaceTempView("bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cell_encode(lat, lon, r) FROM bad").collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
  }

  // ---- geohash ----

  test("geohash reproduces the published reference vectors") {
    import graft.exprs.GeohashOps
    // the two classic published examples (Niemeyer's announcement /
    // widely-reproduced docs)
    assert(GeohashOps.encode(42.605, -5.603, 5) == "ezs42")
    assert(GeohashOps.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    // poles/antimeridian clamp into the max cell instead of overflowing
    assert(GeohashOps.encode(90.0, 180.0, 12) == "zzzzzzzzzzzz")
    assert(GeohashOps.encode(-90.0, -180.0, 12) == "000000000000")
  }

  test("geohash prefix-nesting is exact: precision p is a prefix of p+k") {
    import graft.exprs.GeohashOps
    var seed = 987654321L
    def next(): Long = { seed = (seed * 48271) % 2147483647L; seed }
    for (_ <- 1 to 300) {
      val lat = (next() % 180000).toDouble / 1000.0 - 90.0
      val lon = (next() % 360000).toDouble / 1000.0 - 180.0
      val g12 = GeohashOps.encode(lat, lon, 12)
      for (p <- 1 to 11)
        assert(GeohashOps.encode(lat, lon, p) == g12.take(p),
          s"($lat,$lon) p=$p: ${GeohashOps.encode(lat, lon, p)} vs $g12")
    }
  }

  test("geohash column expression stays codegen'd and null-safe") {
    val df = spark.range(100).select(
      (col("id").cast("double") / 10.0 - 5.0).as("lat"),
      (col("id").cast("double") / 5.0 - 10.0).as("lon"))
      .union(spark.range(1).select(lit(null).cast("double"), lit(null).cast("double")))
    val out = df.select(graft.exprs.fns.geohash(col("lat"), col("lon"), 6).as("g"))
    assert(out.filter(col("g").isNull).count() == 1)
    assert(out.filter(col("g").isNotNull).count() == 100)
    // '*' marks whole-stage-codegen'd operators in the plan string: the
    // Project computing geohash_encode must carry it
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [geohash_encode"), plan)
  }

  test("geometry-kernel SQL functions: PIP, polyline dist, clip area, hull family") {
    GraftPlans.enable(spark)
    val r = spark.sql(
      """SELECT
        |  graft_point_in_polygon(0.5D, 0.5D,
        |    array(array(0.0D,0.0D, 1.0D,0.0D, 1.0D,1.0D, 0.0D,1.0D))) AS inside,
        |  graft_point_in_polygon(1.5D, 0.5D,
        |    array(array(0.0D,0.0D, 1.0D,0.0D, 1.0D,1.0D, 0.0D,1.0D))) AS outside,
        |  graft_point_polyline_dist(0.0D, 0.5D,
        |    array(struct(1.0D AS lat, 0.0D AS lon), struct(1.0D AS lat, 1.0D AS lon))) AS pld,
        |  graft_clip_rect_area(
        |    array(array(0.0D,0.0D, 2.0D,0.0D, 2.0D,2.0D, 0.0D,2.0D)),
        |    1.0D, 1.0D, 3.0D, 3.0D) AS clip,
        |  graft_hull_diam2(array(struct(0L AS u, 0L AS v), struct(3L AS u, 4L AS v),
        |    struct(1L AS u, 1L AS v))) AS d2,
        |  graft_hull_area2(array(struct(0L AS u, 0L AS v), struct(2L AS u, 0L AS v),
        |    struct(0L AS u, 2L AS v))) AS a2,
        |  size(graft_convex_hull_uv(array(struct(0L AS u, 0L AS v),
        |    struct(2L AS u, 0L AS v), struct(0L AS u, 2L AS v), struct(1L AS u, 1L AS v)))) AS nh
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 1.0) // [1,2]×[1,2] overlap of the 2×2 square
    assert(r.getLong(4) == 25L)
    assert(r.getLong(5) == 4L)
    assert(r.getInt(6) == 3) // interior point dropped
  }

  test("quadkey: base-4 interleave matches a bit-loop reference and ancestors are prefixes") {
    import spark.implicits._
    def refQuadkey(lat: Double, lon: Double, z: Int): String = {
      val tx = graft.geom.Geom.tileX(lon, z); val ty = graft.geom.Geom.tileY(lat, z)
      (1 to z).map { i =>
        val d = ((tx >> (z - i)) & 1) + 2 * ((ty >> (z - i)) & 1)
        ('0' + d).toChar
      }.mkString
    }
    val pts = Seq((37.001, -121.999), (37.421, -121.513), (37.98765, -121.01234))
    val df = pts.toDF("lat", "lon")
    // prefixLen = zoom → qk_prefix IS the full quadkey; one row per distinct key
    val got15 = graft.ops.SpatialOps.quadkeyRollup(df, 15, 15)
      .select("qk_prefix").as[String].collect().toSet
    assert(got15 === pts.map(p => refQuadkey(p._1, p._2, 15)).toSet)
    // ancestor containment: the z8 key of each point prefixes its z15 key
    val got8 = graft.ops.SpatialOps.quadkeyRollup(df, 8, 8)
      .select("qk_prefix").as[String].collect().toSet
    for (p <- pts)
      assert(refQuadkey(p._1, p._2, 15).startsWith(refQuadkey(p._1, p._2, 8)))
    assert(got8 === pts.map(p => refQuadkey(p._1, p._2, 8)).toSet)
    // and the registered roll-up's prefix column equals substr(z15 key, 1, 8)
    val roll = graft.ops.SpatialOps.quadkeyRollup(df, 15, 8)
      .select("qk_prefix").as[String].collect().toSet
    assert(roll === pts.map(p => refQuadkey(p._1, p._2, 15).take(8)).toSet)
  }

  test("no graft Catalyst expression falls back from whole-stage codegen") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val exprClasses: Seq[Class[_]] = Seq(
      classOf[graft.exprs.CellEncode], classOf[graft.exprs.CellsCovering],
      classOf[graft.exprs.CellDisk], classOf[graft.exprs.CellDiskRect],
      classOf[graft.exprs.CellParent], classOf[graft.exprs.S2CellEncode],
      classOf[graft.exprs.Hex7CellEncode], classOf[graft.exprs.TileId],
      classOf[graft.exprs.GeohashEncode], classOf[graft.exprs.Haversine],
      classOf[graft.exprs.SegmentsIntersect], classOf[graft.exprs.SimplifyPolyline],
      classOf[graft.exprs.PointPolylineDist], classOf[graft.exprs.PointInPolygon],
      classOf[graft.exprs.PointInPolygonFirst], classOf[graft.exprs.CleanStreetKey],
      classOf[graft.exprs.MinHashSig], classOf[graft.exprs.SimHash64],
      classOf[graft.exprs.RollingMinHash], classOf[graft.exprs.MultiPatternMatch],
      classOf[graft.exprs.WalkWithinWay], classOf[graft.exprs.CosineSim])
    for (c <- exprClasses)
      assert(!classOf[CodegenFallback].isAssignableFrom(c),
        s"${c.getSimpleName} is CodegenFallback — it splits whole-stage codegen")
  }
}
