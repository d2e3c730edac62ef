package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cells.GridCell
import graft.exprs.fns
import graft.ops.{GeomIntersections, TopoIntersections, WayOps}

/** Replays the reference's EMBEDDED REAL-OSM FIXTURE
  * (`/root/reference/js/gpsBins.js:251-476`): two actual ways near the
  * I-580/Buchanan St junction — way 6325652 ("John T. Knox Freeway",
  * highway=motorway, ref="I 580") and way 6326216 (unnamed motorway_link).
  * The JS test adds way 1 to the 0.01° bins and iterates way 2's bins,
  * yielding way 1 as the (only) candidate; the pair then produces NO
  * intersection output (no shared nodes, lon ranges disjoint so no geometric
  * crossing, and motorway×motorway_link is rejected by checkHighwayTypes,
  * geo.js:217-235).
  *
  * This is the only real-world (non-synthetic) data in the sandbox —
  * everything else is gated by the self-designed synth world, so this spec
  * is the blind-spot check: the same candidate-generation + refinement
  * machinery, fed the reference's own data, must reproduce the reference's
  * observable behavior.
  *
  * Binning divergence (documented): the reference rounds bounds min DOWN and
  * max UP to whole bins and iterates INCLUSIVELY (gpsBins.js:94-116), i.e. a
  * one-bin safety buffer past the max edge; GridCell.covering floors both
  * ends and callers add an explicit bufferDeg where a distance buffer is
  * semantically required (SpatialOps.segmentCells). Candidate SUPERSETS
  * differ, final results cannot: the buffer bins only ever ADD candidates,
  * and refinement filters them.
  */
class FixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // geometry transcribed from gpsBins.js:251-476 (lat, lon)
  private val way1Geom: Seq[(Double, Double)] = Seq(
    (37.891877, -122.3088681), (37.8917443, -122.3088562), (37.8916188, -122.3088493),
    (37.8914905, -122.3088447), (37.8913598, -122.3088443), (37.8912263, -122.3088479),
    (37.8910963, -122.3088553), (37.8909779, -122.3088666), (37.8908547, -122.308882),
    (37.8907263, -122.3089008), (37.8906008, -122.3089245), (37.8904746, -122.3089496),
    (37.8903505, -122.308975), (37.8902241, -122.3090017), (37.8897045, -122.3091083))
  private val way1Nodes: Seq[Long] = Seq(53010172L, 8847702260L, 8847702254L, 8847702248L,
    8847702266L, 8847702273L, 53010174L, 8847702238L, 8847702232L, 258763779L,
    8847702226L, 8847702219L, 8847702242L, 53010176L, 258763794L)

  private val way2Geom: Seq[(Double, Double)] = Seq(
    (37.8949985, -122.3081676), (37.89466, -122.3081537), (37.8940292, -122.3079741),
    (37.8939149, -122.3079416), (37.8938049, -122.3079141), (37.8936902, -122.3078931),
    (37.8935663, -122.3078731), (37.8934405, -122.3078566), (37.8932553, -122.3078363),
    (37.8931549, -122.3078265), (37.8930607, -122.3078168), (37.8929626, -122.3078098),
    (37.8928689, -122.3078044), (37.8927942, -122.3078014), (37.8927189, -122.3078003),
    (37.8926351, -122.3078022), (37.8923857, -122.3078121), (37.892345, -122.3078149))
  private val way2Nodes: Seq[Long] = Seq(86276989L, 86276975L, 86276970L, 8847744339L,
    86276965L, 8847744342L, 8847744345L, 8847744348L, 86276957L, 8847744324L,
    8847744327L, 8847744330L, 86276954L, 8847744333L, 8847744335L, 8847744337L,
    86276950L, 86276942L)

  private def fixtureWays = {
    import spark.implicits._
    Seq(
      (6325652L, way1Nodes, way1Geom,
        Map("highway" -> "motorway", "name" -> "John T. Knox Freeway", "ref" -> "I 580")),
      (6326216L, way2Nodes, way2Geom,
        Map("highway" -> "motorway_link")))
      .toDF("id", "nodes", "geomPairs", "tags")
      .withColumn("geometry", expr(
        "transform(geomPairs, p -> struct(p._1 as lat, p._2 as lon))"))
      .drop("geomPairs")
  }

  test("bounds derived from geometry equal the fixture's recorded bounds") {
    val b = GeomIntersections.withBounds(
      fixtureWays.select(col("id").as("way_id"), col("nodes"), col("geometry")))
      .select("way_id", "min_lat", "min_lon", "max_lat", "max_lon")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(b(6325652L) === ((37.8897045, -122.3091083, 37.891877, -122.3088443)))
    assert(b(6326216L) === ((37.892345, -122.3081676, 37.8949985, -122.3078003)))
  }

  test("0.01-degree bin membership: way1 covers 2 cells, way2 covers 1, they share 1") {
    val c1 = GridCell.covering(37.8897045, -122.3091083, 37.891877, -122.3088443, 2).toSet
    val c2 = GridCell.covering(37.892345, -122.3081676, 37.8949985, -122.3078003, 2).toSet
    assert(c1.size === 2) // lat bins 37.88 and 37.89, one lon bin -122.31
    assert(c2.size === 1) // lat bin 37.89, lon bin -122.31
    assert((c1 & c2).size === 1)
    // the shared bin is (-122.31, 37.89) in reference key terms
    val shared = (c1 & c2).head
    assert(GridCell.unpackLonIdx(shared) === -12231L)
    assert(GridCell.unpackLatIdx(shared) === 3789L)
  }

  test("cell-join candidate generation yields exactly the (6325652, 6326216) pair") {
    val withCells = GeomIntersections.withBounds(
      fixtureWays.select(col("id").as("way_id"), col("geometry")))
      .select(col("way_id"), explode(fns.cells_covering(
        col("min_lat"), col("min_lon"), col("max_lat"), col("max_lon"), 2)).as("cell"))
    val l = withCells.select(col("cell"), col("way_id").as("id1"))
    val r = withCells.select(col("cell"), col("way_id").as("id2"))
    val pairs = l.join(r, Seq("cell")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct().collect()
    assert(pairs.map(p => (p.getLong(0), p.getLong(1))).toSeq === Seq((6325652L, 6326216L)))
  }

  test("refinement: no shared nodes, no geometric crossing, link pair rejected -> 0 output rows") {
    assert(way1Nodes.toSet.intersect(way2Nodes.toSet).isEmpty)
    // exact polyline intersection says disjoint (lon ranges don't overlap)
    val flat1 = way1Geom.flatMap(p => Seq(p._1, p._2)).toArray
    val flat2 = way2Geom.flatMap(p => Seq(p._1, p._2)).toArray
    assert(graft.geom.Geom.polylineIntersectFirst(flat1, flat2) === null)
    // the full pipelines on this 2-way world emit nothing, like the reference
    val wayData = WayOps.deriveWayData(spark, fixtureWays)
    assert(GeomIntersections(spark, wayData).count() === 0L)
    assert(TopoIntersections(spark, wayData, fixtureWays).count() === 0L)
  }
}
