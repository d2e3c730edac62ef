package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line with the headline
  * metric (spatial-join + tile-assignment rows/sec, per BASELINE.json), the
  * per-query wall times, and the two-parallelism scaling evidence
  * (local[N] vs local[4N] on identical parquet input; efficiency =
  * speedup / 4). All progress chatter goes to stderr.
  *
  * The scaling measurement reads its inputs from parquet written once in a
  * prep phase — each measured session starts from a storage scan (the shape
  * a real cluster job has), not from in-memory synth state.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** prep: geotagged image rows (replicated ×mult with perturbed phash) and
    * street ways written to parquet once. Returns (imagesPath, waysPath, g). */
  private def prepHeadlineInput(spark: SparkSession, sfDir: String, mult: Int,
                                dir: String): (String, String, Int) = {
    val (g, _, wayData) = Pipeline.prepared(spark, sfDir)
    val base = graft.synth.Synth.images(spark, sfDir, g, withBytes = false)
    val imgs0 =
      if (mult <= 1) base
      else base.crossJoin(spark.range(mult).select(col("id").as("rep")))
        .withColumn("phash", pmod(col("phash") + col("rep") * 1000003L, lit(Long.MaxValue)))
        .withColumn("image_id", concat(col("image_id"), lit("_"), col("rep")))
        .drop("rep")
    graft.synth.Synth.withGeotag(imgs0, g)
      .write.mode("overwrite").parquet(s"$dir/images")
    wayData.filter(col("way_id") < 2000000L)
      .select("way_id", "name", "geometry")
      .write.mode("overwrite").parquet(s"$dir/ways")
    (s"$dir/images", s"$dir/ways", g)
  }

  /** measured job: parquet scan -> segment-cell join (nearest-street
    * assignment) -> Web-Mercator tile id -> city PIP -> count.
    * Returns (inputRows, seconds). */
  def headline(spark: SparkSession, imagesPath: String, waysPath: String, g: Int): (Long, Double) = {
    val imgs = spark.read.parquet(imagesPath)
    val ways = spark.read.parquet(waysPath)
    val polys = graft.synth.Synth.cityPolys(g)
    val joined = ops.SpatialOps.imageWayCellJoin(imgs, ways, res = 3, maxDistDeg = 0.00035)
      .withColumn("tile_id", graft.exprs.fns.tile_id(col("lat"), col("lon"), 15))
      .withColumn("city", graft.exprs.fns.point_in_polygon_first(
        col("lat"), col("lon"), polys, "Unincorporated"))
    val t0 = System.nanoTime()
    val outRows = joined.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val inputRows = spark.read.parquet(imagesPath).count() // metadata-only
    System.err.println(f"[bench] headline: $inputRows input rows, $outRows joined rows in $sec%.2f s")
    (inputRows, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "16").toInt
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      s"/tmp/graft_bench_${new java.io.File(sfDir).getName}")

    // ---- per-query timings at the requested parallelism ----
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s ${if (ok) f"$sec%8.2f s" else "FAILED"}")
      name -> (if (ok) sec else -1.0)
    }

    // ---- scaling evidence: identical headline at N and 4N threads ----
    val nLow = math.max(2, cpus / 4)
    val nHigh = cpus
    val (imgP, wayP, g) = prepHeadlineInput(spark, sfDir, mult, benchDir)
    headline(spark, imgP, wayP, g) // warm-up (JIT + page cache), not reported
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    spark = session(nLow)
    val (rowsLow, secLow) = headline(spark, imgP, wayP, g)
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    spark = session(nHigh)
    val (rowsHigh, secHigh) = headline(spark, imgP, wayP, g)
    spark.stop()

    val rpsLow = rowsLow / secLow
    val rpsHigh = rowsHigh / secHigh
    val eff = (secLow / secHigh) / (nHigh.toDouble / nLow.toDouble)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val scaling =
      s"""{"n_low":$nLow,"n_high":$nHigh,"rows":$rowsHigh,"sec_low":$secLow,"sec_high":$secHigh,""" +
        s""""rows_per_sec_low":$rpsLow,"rows_per_sec_high":$rpsHigh,"efficiency":$eff}"""
    println(
      s"""{"metric":"spatial_join_tile_rows_per_sec","value":$rpsHigh,"unit":"rows/sec",""" +
        s""""queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
