package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON sink/source (S6/S7): Point FeatureCollections in the reference's
  * output shape (geo.js:1246-1266, golden files under data/intersections/).
  *
  * Two write paths:
  *  - jsonl: one Feature per line, distributed (the scale path; a
  *    FeatureCollection framing line pair is written by the reader/driver)
  *  - single: driver-collected pretty FeatureCollection, byte-comparable to
  *    the reference's per-county outputs (those are ≤ a few MB each)
  */
object GeoJson {

  /** features DF (lat, lon, streets, nodeId, wayIds, cityName) → GeoJSON
    * Feature JSON strings. Coordinates emitted [lon, lat] (geo.js:1250). */
  def featureJson(features: DataFrame): DataFrame =
    features.select(to_json(struct(
      lit("Feature").as("type"),
      struct(
        lit("Point").as("type"),
        array(col("lon"), col("lat")).as("coordinates")).as("geometry"),
      struct(
        split(col("streets"), "/").as("streets"),
        col("nodeId").as("nodeId"),
        col("wayIds").as("wayIds"),
        col("cityName").as("cityName")).as("properties"))).as("feature"))

  def writeJsonl(features: DataFrame, path: String): Unit =
    featureJson(features).write.mode("overwrite").text(path)

  /** single-file FeatureCollection (reference-shaped). */
  def writeSingle(features: DataFrame, path: String): Unit = {
    val lines = featureJson(features).collect().map(_.getString(0))
    val body = lines.mkString("{\"type\":\"FeatureCollection\",\"features\":[\n", ",\n", "\n]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
  }

  def readFeatures(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.json(path)
    df.select(
      element_at(col("geometry.coordinates"), 2).as("lat"),
      element_at(col("geometry.coordinates"), 1).as("lon"),
      concat_ws("/", col("properties.streets")).as("streets"),
      col("properties.nodeId").as("nodeId"),
      col("properties.wayIds").as("wayIds"),
      col("properties.cityName").as("cityName"))
  }
}
