package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Skew, SpatialOps}

/** Skew handling: salted and adaptive-res joins must return exactly the
  * plain cell-join result while bounding rows per join key. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed synthetic points: 80% of points inside one cell
  private def skewedImages(n: Int) = {
    spark.range(n).select(
      concat(lit("p"), col("id")).as("image_id"),
      when(col("id") % 5 < 4,
        lit(37.0005) + (col("id") % 97).cast("double") * lit(1e-6))   // hot cell
        .otherwise(lit(37.0) + (col("id") % 40).cast("double") * lit(0.001) + lit(0.0004))
        .as("lat"),
      when(col("id") % 5 < 4,
        lit(-121.9995) + (col("id") % 89).cast("double") * lit(1e-6))
        .otherwise(lit(-122.0) + (col("id") % 40).cast("double") * lit(0.001) + lit(0.0004))
        .as("lon"))
  }

  private def ways() = {
    val (_, _, wayData) = Pipeline.prepared(spark, "/root/testdata/sf0.001")
    wayData.filter(col("way_id") < 2000000L)
  }

  test("hot-cell histogram identifies the dense cell") {
    val imgs = skewedImages(5000)
      .withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 3))
    val hot = Skew.hotCells(imgs, threshold = 1000)
    assert(hot.size === 1)
    assert(hot.head === graft.cells.GridCell.encode(37.0005, -121.9995, 3))
  }

  test("salted join result equals plain cell join; per-key load is bounded") {
    val imgs = skewedImages(4000)
    val plain = SpatialOps.imageWayCellJoin(imgs, ways(), res = 3, maxDistDeg = 0.0006)
      .select("image_id", "way_id").as[(String, Long)].collect().toSet
    val salted = Skew.saltedImageWayJoin(imgs, ways(), res = 3, maxDistDeg = 0.0006,
      hotThreshold = 500, nSalts = 8)
      .select("image_id", "way_id").as[(String, Long)].collect().toSet
    assert(plain.nonEmpty)
    assert(salted === plain)
    // the hot cell's probes actually spread over >1 salt key
    val hot = Skew.hotCells(
      imgs.withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 3)), 500)
    val keys = imgs
      .withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 3))
      .withColumn("k", Skew.saltedPointKey(col("cell"), col("image_id"), hot, 8))
      .groupBy("k").count().as[(Long, Long)].collect()
    val hotKeyCounts = keys.filter { case (k, _) => hot.contains(k / 64) }
    assert(hotKeyCounts.length === 8) // all salts used
    assert(hotKeyCounts.map(_._2).max < 3200) // no single key holds all hot rows
  }

  test("adaptive subdivision build keys cover exactly the hot region at fine res") {
    val segs = SpatialOps.segmentCells(ways(), res = 2, bufferDeg = 0.0)
    val hotSet = Set(graft.cells.GridCell.encode(37.005, -121.995, 2))
    val keys = Skew.adaptiveBuildKeys(segs, resCoarse = 2, resFine = 3,
      bufferDeg = 0.0, hot = hotSet)
    val tagged = keys.select((col("akey") % 64).cast("int").as("res"), col("akey"))
      .groupBy("res").count().as[(Int, Long)].collect().toMap
    assert(tagged.contains(2) && tagged.contains(3))
    // every fine key's parent is the hot cell
    val fineParents = keys.filter(col("akey") % 64 === 3)
      .select(graft.exprs.fns.cell_parent(expr("akey div 64"), 3, 2))
      .distinct().as[Long].collect().toSet
    assert(fineParents === hotSet)
  }

  test("adaptive-subdivision join equals plain cell join; hot probes re-key fine") {
    // a DENSE-BUT-SPREAD hot cell (the case subdivision is for, vs salting
    // for same-coordinate pileups): all 4000 points in one 0.01° res-2 cell
    // but spanning ~9×9 res-3 cells
    val imgs = spark.range(4000).select(
      concat(lit("p"), col("id")).as("image_id"),
      (lit(37.0) + (col("id") % 90).cast("double") * lit(1e-4) + lit(3e-5)).as("lat"),
      (lit(-122.0) + (col("id") % 83).cast("double") * lit(1e-4) + lit(3e-5)).as("lon"))
    val plain = SpatialOps.imageWayCellJoin(imgs, ways(), res = 2, maxDistDeg = 0.0006)
      .select("image_id", "way_id").as[(String, Long)].collect().toSet
    val adaptive = Skew.adaptiveImageWayJoin(imgs, ways(), resCoarse = 2,
      resFine = 3, maxDistDeg = 0.0006, hotThreshold = 500)
      .select("image_id", "way_id").as[(String, Long)].collect().toSet
    assert(plain.nonEmpty)
    assert(adaptive === plain)
    // probes inside the hot coarse cell actually land on fine (res-tagged 3)
    // keys, and spread over many of them — the geometric load bound
    val coarse = imgs.withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 2))
    val hot = Skew.hotCells(coarse, 500)
    assert(hot.nonEmpty)
    val fineKeys = coarse
      .withColumn("akey", Skew.adaptivePointKey(col("lat"), col("lon"), 2, 3, hot))
      .filter(col("akey") % 64 === 3)
      .select("akey").distinct().as[Long].collect()
    assert(fineKeys.length > 20, s"hot probes must spread over many fine cells, got ${fineKeys.length}")
  }
}
