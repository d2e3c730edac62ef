package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: per-stage wall times of the intersections pipeline
  * (the reference prints the same stage breakdown via getMS, geo.js:129-139).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val g = time("gridSize")(graft.synth.Synth.gridSize(spark, sfDir))
    val raw = graft.synth.Synth.ways(spark, g).cache()
    time("raw ways materialize")(raw.count())
    val wayData = graft.ops.WayOps.deriveWayData(spark, raw).cache()
    time("deriveWayData (X1+fakes)")(wayData.count())
    val dead = time("deadEnds")(graft.ops.WayOps.deadEnds(wayData).count())
    // sub-stage breakdown of topo
    locally {
      import graft.ops._
      val nodePairs = wayData
        .select(col("way_pos"), col("name"), posexplode(col("nodes")))
        .select(col("name"), col("col").as("node"),
          (col("way_pos") * 1000000L + col("pos")).as("okey"))
      val nodeAgg = nodePairs.groupBy("node")
        .agg(collect_set(col("name")).as("names"), min(col("okey")).as("ord"))
        .filter(size(col("names")) > 1)
      time("  topo/nodeAgg")(nodeAgg.count())
      val membs = WayOps.nodeMemberships(wayData)
      time("  topo/memberships")(membs.count())
      val gps = wayData
        .select(col("way_pos"), posexplode(arrays_zip(col("nodes"), col("geometry"))))
        .select(col("col.nodes").as("node"))
      time("  topo/nodeGps-ish")(gps.count())
    }
    val topo = graft.ops.TopoIntersections(spark, wayData, raw).cache()
    time("topo intersections")(topo.count())
    val geom = graft.ops.GeomIntersections(spark, wayData).cache()
    time("geom intersections")(geom.count())
    val feats = graft.ops.SpatialOps.assemble(topo, geom, graft.synth.Synth.cityPolys(g))
    time("assemble + PIP")(feats.count())
    val imgs = graft.Pipeline.geoImages(spark, sfDir)
    time("images materialize")(imgs.cache().count())
    time("image-way join")(graft.ops.SpatialOps.imageWayCellJoin(
      imgs, wayData.filter(col("way_id") < 2000000L), 3, 0.00035).count())
    time("image-way join x2")(graft.ops.SpatialOps.imageWayCellJoin(
      imgs, wayData.filter(col("way_id") < 2000000L), 3, 0.00035).count())
    time("knn")(graft.ops.SpatialOps.knnWays(
      imgs, wayData.filter(col("way_id") < 2000000L), 2).count())
    time("knn x2")(graft.ops.SpatialOps.knnWays(
      imgs, wayData.filter(col("way_id") < 2000000L), 2).count())
    if (args.contains("--explain")) {
      feats.explain("formatted")
    }
    spark.stop()
  }
}
