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

  private def session(cpus: Int, shufflePartitions: Int = -1): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        (if (shufflePartitions > 0) shufflePartitions else cpus).toString)
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
    val polys = graft.synth.Synth.cityPolys(g)
    val maxDistDeg = 0.00035
    // tile + city are per-IMAGE attributes: computed map-side BEFORE the
    // join (never replicated per candidate pair)
    val imgs = spark.read.parquet(imagesPath)
      .select(col("image_id"), col("lat"), col("lon"))
      .withColumn("tile_id", graft.exprs.fns.tile_id(col("lat"), col("lon"), 15))
      .withColumn("city", graft.exprs.fns.point_in_polygon_first(
        col("lat"), col("lon"), polys, "Unincorporated"))
      .withColumn("cell", graft.exprs.fns.cell_encode(col("lat"), col("lon"), 3))
    val segs = ops.SpatialOps.segmentCells(
      spark.read.parquet(waysPath), res = 3, bufferDeg = maxDistDeg).drop("name")
    // shuffled hash join: at planet scale the way side cannot broadcast, and
    // a broadcast build is driver-serial (measured: ~10 s for 1.8M segment
    // rows) — the shuffle parallelizes the build and scales with cores.
    // pair dedup shuffles NARROW rows: hashed image key + way id + tile/city
    val assigned = imgs.join(segs.hint("SHUFFLE_HASH"), Seq("cell"))
      .where(graft.exprs.fns.point_seg_dist(col("lat"), col("lon"),
        col("lat1"), col("lon1"), col("lat2"), col("lon2")) <= maxDistDeg)
      .groupBy(xxhash64(col("image_id")).as("img_h"), col("way_id"))
      .agg(max(col("tile_id")).as("tile_id"), max(col("city")).as("city"))
    val t0 = System.nanoTime()
    val outRows = assigned.count()
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
    val skipQueries = sys.env.contains("SPARK_GRAFT_BENCH_SCALING_ONLY")
    val results = (if (skipQueries) Nil else SparkEntry.queries.toSeq.sortBy(_._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s ${if (ok) f"$sec%8.2f s" else "FAILED"}")
      name -> (if (ok) sec else -1.0)
    }

    // ---- scaling evidence: identical headline at N and 4N threads.
    // Same plan at both levels (fixed shuffle partitioning); min over
    // repeats damps shared-host load spikes.
    val nLow = sys.env.get("SPARK_GRAFT_SCALE_LOW").map(_.toInt)
      .getOrElse(math.max(2, cpus / 16))
    val nHigh = 4 * nLow
    val shuffleParts = math.max(nHigh, 32)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    val (imgP, wayP, g) = prepHeadlineInput(spark, sfDir, mult, benchDir)
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // Each level runs in its own JVM, hard-capped to N CPUs via taskset +
    // ActiveProcessorCount (local[N] caps only task slots; GC/IO would
    // otherwise borrow the host's idle cores and corrupt the comparison).
    def measure(n: Int): (Long, Double) = {
      val cp = System.getProperty("java.class.path")
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd = Seq("taskset", "-c", s"0-${n - 1}", javaBin) ++ addOpens ++ Seq(
        s"-XX:ActiveProcessorCount=$n", s"-Xmx$mem", "-cp", cp,
        "graft.BenchWorker", imgP, wayP, g.toString, n.toString,
        repeats.toString, shuffleParts.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes())
      val err = new String(proc.getErrorStream.readAllBytes())
      proc.waitFor()
      err.linesIterator.filter(_.contains("[bench]")).foreach(System.err.println)
      val res = out.linesIterator.find(_.startsWith("RESULT "))
        .getOrElse(sys.error(s"bench worker (n=$n) produced no RESULT: $err"))
      val Array(_, rowsS, secS) = res.split(" ")
      (rowsS.toLong, secS.toDouble)
    }
    spark = null
    // never die without the JSON line: the driver parses it per round
    val scalingResult = try {
      val (rowsLow, secLow) = measure(nLow)
      val (rowsHigh, secHigh) = measure(nHigh)
      Some((rowsLow, secLow, rowsHigh, secHigh))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] scaling failed: $e"); None
    }
    val (rowsLow, secLow, rowsHigh, secHigh) =
      scalingResult.getOrElse((0L, -1.0, 0L, -1.0))
    val rpsLow = if (secLow > 0) rowsLow / secLow else -1.0
    val rpsHigh = if (secHigh > 0) rowsHigh / secHigh else -1.0
    val eff = if (secLow > 0 && secHigh > 0)
      (secLow / secHigh) / (nHigh.toDouble / nLow.toDouble) else -1.0
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val scaling =
      s"""{"n_low":$nLow,"n_high":$nHigh,"rows":$rowsHigh,"sec_low":$secLow,"sec_high":$secHigh,""" +
        s""""rows_per_sec_low":$rpsLow,"rows_per_sec_high":$rpsHigh,"efficiency":$eff}"""
    println(
      s"""{"metric":"spatial_join_tile_rows_per_sec","value":$rpsHigh,"unit":"rows/sec",""" +
        s""""queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
