package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cells.GridCell

case class RasterPt(lat: Double, lon: Double)

/** rasterizeWays: the supercover SAT refine against JTS — the registered
  * query only exercises axis-aligned streets, so DIAGONAL segments are
  * gated here: over the floor-based candidate set (the operator's pixel
  * convention — a segment exactly on a row boundary belongs to the floor
  * row), the rendered pixel set of random polylines must equal
  * { candidate cell : lineString INTERSECTS cell rectangle } per JTS.
  * Random doubles never land exactly on pixel boundaries, so within the
  * candidates the closed-rect JTS semantics and the SAT ≤/≥ agree. */
class SpatialRasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diagonal polylines rasterize to exactly the JTS-intersecting pixel set") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    val res = 3
    val p = GridCell.pow10(res)
    val rnd = new scala.util.Random(42)
    val ways = (0 until 40).map { w =>
      val n = 2 + rnd.nextInt(4)
      val pts = Seq.fill(n)(RasterPt(37.0 + rnd.nextDouble() * 0.02, -122.0 + rnd.nextDouble() * 0.02))
      (w.toLong, s"W$w", pts)
    }
    val df = ways.toDF("way_id", "name", "geometry")
    val got = graft.ops.SpatialOps.rasterizeWays(df, res)
      .select("cell", "n_ways").as[(Long, Long)].collect().toMap

    // JTS truth: for every way, every bbox-candidate cell, intersects?
    val touched = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for ((wid, _, pts) <- ways) {
      val ls = gf.createLineString(pts.map(q => new Coordinate(q.lon, q.lat)).toArray)
      val lats = pts.map(_.lat); val lons = pts.map(_.lon)
      for (cell <- GridCell.covering(lats.min, lons.min, lats.max, lons.max, res)) {
        val xLo = GridCell.unpackLonIdx(cell) / p; val xHi = (GridCell.unpackLonIdx(cell) + 1) / p
        val yLo = GridCell.unpackLatIdx(cell) / p; val yHi = (GridCell.unpackLatIdx(cell) + 1) / p
        val rect = gf.createPolygon(Array(
          new Coordinate(xLo, yLo), new Coordinate(xHi, yLo),
          new Coordinate(xHi, yHi), new Coordinate(xLo, yHi), new Coordinate(xLo, yLo)))
        if (ls.intersects(rect))
          touched(cell) = touched.getOrElse(cell, Set.empty) + wid
      }
    }
    val want = touched.view.mapValues(_.size.toLong).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (c, n) => assert(got(c) === n, s"cell $c") }
    // the scenario is non-trivial: some pixels see >1 way, and the raster
    // is MUCH smaller than the bbox blob (supercover prunes corners)
    assert(want.values.max >= 2)
    val bboxCells = ways.map { case (_, _, pts) =>
      GridCell.covering(pts.map(_.lat).min, pts.map(_.lon).min,
        pts.map(_.lat).max, pts.map(_.lon).max, res).length.toLong
    }.sum
    assert(want.size < bboxCells, "supercover must prune bbox-only candidates")
  }

  test("axis-aligned invariant on real streets: crossings are exactly the g² intersections") {
    val (g, _, wayData) = Pipeline.prepared(spark, "/root/testdata/sf0.001")
    val r = graft.ops.SpatialOps.rasterizeWays(
        wayData.filter(col("way_id") < 2000000L), res = 4)
      .select("n_ways").as[Long].collect()
    assert(r.max === 2L) // no pixel sees more than a crossing pair
    assert(r.count(_ == 2L) === g.toLong * g, "one 2-way pixel per grid intersection")
  }
}
