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
}
