package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.{Pipeline, synth}

/** Adversarial-skew stress gate for the spatial-join skew machinery
  * (north_rule: "skewed hot cells (dense urban tiles) are salted and split
  * via adaptive cell subdivision"): plants a pathological hot cell into the
  * sf0.1 image corpus and measures plain vs salted vs adaptive joins —
  * wall time AND max single-task time, the number that actually decides
  * whether a 1000-executor job finishes or straggles on one key.
  *
  * Two planted shapes, because the two mechanisms bound different physics:
  *  - PILEUP: every hot point at (almost) the same coordinate — salting's
  *    case; no spatial subdivision can split a single coordinate.
  *  - SPREAD: hot points uniform across one coarse cell — adaptive
  *    subdivision's case (fine cells geometrically bound the key), while
  *    salting also works by brute fan-out.
  *
  * All three variants must agree on (rows, checksum) per shape — the same
  * equivalence SkewSpec proves and the driver oracle gates at sf0.01.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.SkewBench
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val res = 3
    val resFine = 5
    val maxDistDeg = 0.00035
    val hotThreshold = 1000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE's own skew mitigation is deliberately OFF: this gate measures
      // the ENGINE's salting/subdivision, not the runtime's post-hoc split
      // (which cannot help a SHUFFLE_HASH join key anyway)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTaskMs.updateAndGet(m => math.max(m, e.taskInfo.duration))
    })

    val (g, _, wayData) = Pipeline.prepared(spark, sfDir)
    val base = Pipeline.geoImages(spark, sfDir).select("image_id", "lat", "lon")
    val nBase = base.count()
    // hot-cell size = hotX × corpus (env knob). The default 0.1 (10% of the
    // corpus in one cell) is already a ~15,000× average-cell-population
    // outlier, but at sf0.1 that is only ~0.3 s of single-task join work —
    // too little to make the plain variant straggle at local[32]. The
    // recorded PERF.md gate runs hotX=10 (one cell carrying 10× the whole
    // corpus), which makes the unmitigated single-key task the wall.
    val hotX = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT_X", "0.1").toDouble
    val hotN = (nBase * hotX).toLong
    // hot cell: the res-3 cell at the grid center (never on a cell edge)
    val cLat = synth.Synth.LAT0 + (g / 2) * 0.001 + 0.0004
    val cLon = synth.Synth.LON0 + (g / 2) * 0.001 + 0.0004
    def planted(shape: String): DataFrame = {
      val pts = spark.range(hotN).select(
        concat(lit(s"hot_${shape}_"), col("id")).as("image_id"),
        (shape match {
          case "pileup" => lit(cLat) + (col("id") % 97).cast("double") * 1e-9
          case "spread" => lit(cLat) - 0.00035 + (col("id") % 701).cast("double") * 1e-6
        }).as("lat"),
        (shape match {
          case "pileup" => lit(cLon) + (col("id") % 89).cast("double") * 1e-9
          case "spread" => lit(cLon) - 0.00035 + (col("id") % 691).cast("double") * 1e-6
        }).as("lon"))
      base.unionByName(pts)
    }
    // materialize each skewed corpus once; every variant reads the same files
    val scratch = s"/tmp/graft_skewbench_${new java.io.File(sfDir).getName}"
    Seq("pileup", "spread").foreach { s =>
      planted(s).repartition(cpus)
        .write.mode("overwrite").parquet(s"$scratch/$s")
    }

    def measure(label: String, df: => DataFrame): (Double, Long, Long, Long) = {
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), expr("bit_xor(xxhash64(image_id, way_id))")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, maxTaskMs.get(), r.getLong(0), r.getLong(1))
    }

    println(f"${"shape"}%-8s ${"variant"}%-10s ${"wall_s"}%8s ${"max_task_s"}%10s ${"rows"}%9s  checksum")
    Seq("pileup", "spread").foreach { shape =>
      val imgs = spark.read.parquet(s"$scratch/$shape")
      val variants = Seq[(String, () => DataFrame)](
        "plain" -> (() => graft.ops.SpatialOps.imageWayCellJoin(imgs, wayData, res, maxDistDeg)),
        "salted" -> (() => graft.ops.Skew.saltedImageWayJoin(imgs, wayData, res, maxDistDeg, hotThreshold)),
        "adaptive" -> (() => graft.ops.Skew.adaptiveImageWayJoin(imgs, wayData, res, resFine, maxDistDeg, hotThreshold)))
      // two passes per variant, keep the better (JIT/page-cache warmup)
      variants.foreach { case (name, mk) =>
        val runs = (0 until 2).map(_ => measure(name, mk()))
        val best = runs.minBy(_._1)
        require(runs.map(r => (r._3, r._4)).distinct.size == 1,
          s"$shape/$name: unstable results across repeats")
        println(f"$shape%-8s $name%-10s ${best._1}%8.2f ${best._2 / 1000.0}%10.2f ${best._3}%9d  ${best._4}%016x")
      }
    }
    spark.stop()
  }
}
