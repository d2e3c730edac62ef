package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Hilbert clustering: curve properties + measured file-level locality win
  * over an unclustered write of the same rows. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("xy2d/d2xy are inverse bijections with unit-adjacent steps") {
    val order = 4 // 16×16 full sweep
    val side = 1 << order
    val seen = scala.collection.mutable.Set[Long]()
    for (x <- 0 until side; y <- 0 until side) {
      val d = Layout.xy2d(order, x, y)
      assert(d >= 0 && d < side.toLong * side)
      assert(seen.add(d), s"duplicate d=$d")
      assert(Layout.d2xy(order, d) === ((x.toLong, y.toLong)))
    }
    // consecutive curve positions are edge-adjacent cells (|dx|+|dy| = 1)
    for (d <- 0L until (side.toLong * side - 1)) {
      val (x1, y1) = Layout.d2xy(order, d)
      val (x2, y2) = Layout.d2xy(order, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
  }

  test("clustered files cover compact regions: bbox area sum shrinks vs unclustered") {
    import spark.implicits._
    // deterministic scatter over a 2°×2° region, shuffled order
    val pts = spark.range(20000).select(
      col("id"),
      (lit(37.0) + (col("id") * 7919L % 2000L).cast("double") * lit(1e-3)).as("lat"),
      (lit(-122.0) + (col("id") * 104729L % 2000L).cast("double") * lit(1e-3)).as("lon"))
      .cache()
    val base = "/tmp/graft_layout_test"
    Layout.writeSpatiallyClustered(pts, "lat", "lon", res = 2, numFiles = 16, s"$base/clustered")
    pts.repartition(16).write.mode("overwrite").parquet(s"$base/plain")

    def fileBboxAreaSum(path: String): Double =
      spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(((max("lat") - min("lat")) * (max("lon") - min("lon"))).as("area"))
        .agg(sum("area")).head().getDouble(0)

    val clustered = fileBboxAreaSum(s"$base/clustered")
    val plain = fileBboxAreaSum(s"$base/plain")
    // round-robin files each cover ~the whole region (16 × 4 deg² ≈ 64);
    // Hilbert files cover ~1/16 each (≈ 4 deg² total)
    assert(clustered < plain / 5.0, s"clustered=$clustered plain=$plain")
    // row preservation
    assert(spark.read.parquet(s"$base/clustered").count() === 20000L)
    val ids = spark.read.parquet(s"$base/clustered").select("id")
      .as[Long].collect().sorted
    assert(ids === (0L until 20000L).toArray)
  }

  test("bboxRanges: complete and tight over random bboxes") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val minLat = 30.0 + rng.nextDouble() * 10
      val minLon = -125.0 + rng.nextDouble() * 10
      val maxLat = minLat + rng.nextDouble() * 0.02
      val maxLon = minLon + rng.nextDouble() * 0.02
      val res = 2 + rng.nextInt(2)
      val cells = graft.cells.GridCell.covering(minLat, minLon, maxLat, maxLon, res)
      val ranges = Layout.bboxRanges(minLat, minLon, maxLat, maxLon, res)
      // tight: total covered curve positions == number of covering cells
      assert(ranges.map(r => r._2 - r._1 + 1).sum === cells.length.toLong)
      // complete: every covering cell's position is inside some range
      cells.foreach { c =>
        val d = Layout.hilbertOfCell(c, res)
        assert(ranges.exists(r => d >= r._1 && d <= r._2), s"cell $c missed")
      }
      // disjoint and sorted
      ranges.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + 1 < b._1)
        case _ =>
      }
    }
  }

  test("hilbertRangeScan is row-identical to the plain bbox filter") {
    val pts = spark.range(30000).select(
      col("id"),
      (lit(37.0) + (col("id") * 7919L % 3000L).cast("double") * lit(1e-4)).as("lat"),
      (lit(-122.0) + (col("id") * 104729L % 3000L).cast("double") * lit(1e-4)).as("lon"))
    val (lo1, lo2, hi1, hi2) = (37.05, -121.93, 37.11, -121.86)
    val scanned = Layout.hilbertRangeScan(pts, "lat", "lon", lo1, lo2, hi1, hi2, res = 3)
      .select("id")
    val plain = pts.filter(col("lat") >= lo1 && col("lat") <= hi1 &&
      col("lon") >= lo2 && col("lon") <= hi2).select("id")
    assert(scanned.exceptAll(plain).isEmpty && plain.exceptAll(scanned).isEmpty)
    assert(plain.count() > 0L)
  }
}
