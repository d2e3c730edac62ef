package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.OffsetOps
import graft.sources.GeoJson
import graft.geom.Geom

class OffsetGeoJsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def waysDf(ws: Seq[(Long, Seq[Long], Seq[(Double, Double)], Map[String, String])]) =
    ws.toDF("id", "nodes", "geom0", "tags")
      .withColumn("geometry", expr("transform(geom0, g -> struct(g._1 as lat, g._2 as lon))"))
      .drop("geom0")

  test("X2: offset walks within a way, interpolates, continues across same-named way") {
    // two same-named ways sharing node 3: A(1-2-3), B(3-4); ~89 m per segment
    val ways = waysDf(Seq(
      (1L, Seq(1L, 2L, 3L), Seq((37.0, -122.002), (37.0, -122.001), (37.0, -122.0)),
        Map("highway" -> "residential", "name" -> "Cont Rd")),
      (2L, Seq(3L, 4L), Seq((37.0, -122.0), (37.0, -121.999)),
        Map("highway" -> "residential", "name" -> "Cont Rd")),
      (3L, Seq(3L, 9L), Seq((37.0, -122.0), (37.001, -122.0)),
        Map("highway" -> "residential", "name" -> "Other"))))
    val seg = math.round(Geom.haversineM(37.0, -122.002, 37.0, -122.001) * 1e6) / 1e6
    val reqs = Seq(
      (1L, 1L, 0.0),            // at node
      (1L, 1L, seg / 2),        // mid first segment
      (1L, 1L, 2 * seg + seg / 2), // continues onto way 2
      (1L, 3L, -2 * seg),       // backward to node 1
      (1L, 1L, 1e9)             // off the end -> null
    ).toDF("way_id", "node_id", "offset_m")
    val out = OffsetOps.offsetAlong(spark, ways, reqs)
      .orderBy("offset_m")
      .select("offset_m", "olat", "olon")
      .collect()
    val rows = out.map(r => (r.getDouble(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val m = rows.map { case (o, la, lo) => o -> ((la, lo)) }.toMap
    assert(m(0.0) === ((Some(37.0), Some(-122.002))))
    assert(math.abs(m(seg / 2)._2.get - (-122.0015)) <= 2e-6)
    assert(math.abs(m(2 * seg + seg / 2)._2.get - (-121.9995)) <= 2e-6) // on way 2
    assert(m(-2 * seg) === ((Some(37.0), Some(-122.002))))    // exact back-walk
    assert(m(1e9) === ((None, None)))
  }

  test("GeoJSON sink round-trips features (jsonl + single FeatureCollection)") {
    val feats = Seq(
      (37.001, -121.999, "A st/B st", "1000001", Seq(1L, 2L), "alpha"),
      (37.0025, -122.0005, "C st/I 80", "Geom", Seq(3L, 9L), "Unincorporated"))
      .toDF("lat", "lon", "streets", "nodeId", "wayIds", "cityName")
    val dir = java.nio.file.Files.createTempDirectory("geojson").toString
    GeoJson.writeJsonl(feats, s"$dir/features")
    val back = GeoJson.readFeatures(spark, s"$dir/features")
      .orderBy("streets")
      .collect()
    assert(back.length === 2)
    assert(back(0).getAs[String]("streets") === "A st/B st")
    assert(back(0).getAs[Double]("lat") === 37.001)
    assert(back(0).getAs[String]("cityName") === "alpha")
    assert(back(1).getAs[String]("nodeId") === "Geom")

    GeoJson.writeSingle(feats, s"$dir/single.json")
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/single.json"))
    assert(txt.startsWith("{\"type\":\"FeatureCollection\""))
    assert(txt.contains("\"coordinates\":[-121.999,37.001]")) // [lon,lat] order
  }
}
