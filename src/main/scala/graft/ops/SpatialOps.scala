package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.exprs.fns

/** Output assembly + image-table spatial operators.
  *
  * Assembly reproduces makeIntersectionGeoJson (geo.js:1246-1266): fix6
  * rounding, first-match city PIP with 'Unincorporated' fallback (J6).
  * The image operators generalize the reference's spatial join to the
  * north_rule workload: geotagged image rows joined against ways via cell
  * buckets, kNN street lookup (J7), and Web-Mercator tile assignment.
  */
object SpatialOps {

  /** Final feature rows: topo ∪ geometric, rounded, city-assigned.
    * polys: prepared city polygons (broadcast-nested-loop PIP with envelope
    * prefilter inside PointInPolygonFirst). */
  def assemble(topo: DataFrame, geom: DataFrame,
               polys: Array[(String, Array[Array[Double]])]): DataFrame = {
    val unioned = topo
      .withColumn("nodeId", col("nodeId").cast("string"))
      .select("lat", "lon", "raw", "streets", "wayIds", "nodeId", "ord")
      .unionByName(geom.select("lat", "lon", "raw", "streets", "wayIds", "nodeId", "ord"))
    unioned
      .withColumn("lat", round(col("lat"), 6))
      .withColumn("lon", round(col("lon"), 6))
      .withColumn("cityName",
        fns.point_in_polygon_first(col("lat"), col("lon"), polys, "Unincorporated"))
  }

  /** J2 applied to the image workload: geotagged images equi-joined to ways
    * on shared grid cell, refined by exact point-to-polyline distance ≤
    * maxDistDeg. Ways replicate into covering cells (small side, broadcast);
    * images encode once per row (no replication of the big side). */
  def imageWayCellJoin(images: DataFrame, wayData: DataFrame,
                       res: Int, maxDistDeg: Double): DataFrame = {
    // ways replicate into cells of their bbox EXPANDED by the distance
    // threshold — the big (image) side stays single-cell, the small side
    // absorbs the buffer (scale-friendly)
    val wayCells = GeomIntersections.withBounds(wayData)
      .select(col("way_id"), col("name"), col("geometry"),
        explode(fns.cells_covering(col("min_lat") - maxDistDeg, col("min_lon") - maxDistDeg,
          col("max_lat") + maxDistDeg, col("max_lon") + maxDistDeg, res)).as("cell"))
    val imgCells = images.withColumn("cell", fns.cell_encode(col("lat"), col("lon"), res))
    imgCells.join(broadcast(wayCells), Seq("cell"))
      .withColumn("dist_deg",
        fns.point_polyline_dist(col("lat"), col("lon"), col("geometry")))
      .filter(col("dist_deg") <= maxDistDeg)
  }

  /** J7 kNN: k nearest ways per image via cell-disk candidate join + exact
    * refinement + row_number top-k. Candidates come from the (2*ring+1)²
    * cell disk around the image's cell; correct when the k-th neighbor lies
    * within ring*cellSize of the image (guaranteed by construction for the
    * synthetic grid at res 3, ring 1). Distances are rounded to 1e-9 degrees
    * before ranking so ordering is reproducible across engines; ties break
    * by way_id.
    */
  def knnWays(images: DataFrame, wayData: DataFrame,
              k: Int, res: Int = 3, ring: Int = 1): DataFrame = {
    val wayCells = GeomIntersections.withBounds(wayData)
      .select(col("way_id"), col("name"), col("geometry"),
        explode(fns.cells_covering(col("min_lat"), col("min_lon"),
          col("max_lat"), col("max_lon"), res)).as("cell"))
    val cands = images
      .withColumn("cell0", fns.cell_encode(col("lat"), col("lon"), res))
      .withColumn("cell", explode(fns.cell_disk(col("cell0"), lit(ring))))
      .join(broadcast(wayCells), Seq("cell"))
      // compute distance BEFORE dedup so the shuffle carries narrow rows,
      // not way geometries (same way from several disk cells → same dist)
      .withColumn("dist9",
        round(fns.point_polyline_dist(col("lat"), col("lon"), col("geometry")) * lit(1e9), 0)
          .cast("long"))
      .drop("geometry", "cell", "cell0")
      .dropDuplicates("image_id", "way_id")
    val w = Window.partitionBy("image_id").orderBy(col("dist9"), col("way_id"))
    cands
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Raster-tile assignment: packed Web-Mercator tile id per image. */
  def tileAssign(images: DataFrame, zoom: Int): DataFrame =
    images.withColumn("tile_id", fns.tile_id(col("lat"), col("lon"), zoom))

  /** J6 for images: city per image point. */
  def imageCity(images: DataFrame, polys: Array[(String, Array[Array[Double]])]): DataFrame =
    images.withColumn("city",
      fns.point_in_polygon_first(col("lat"), col("lon"), polys, "Unincorporated"))
}
