package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exprs.fns
import graft.synth.Codec

/** Geospatial statistics over the image corpus — the raster↔vector analytics
  * layer on top of the join engine: zonal statistics (exact decoded-pixel
  * aggregates per polygon zone) and Getis-Ord Gi* hotspot detection (local
  * spatial autocorrelation z-scores per map tile; Getis & Ord,
  * Geographical Analysis 1992 — public).
  *
  * Both are DETERMINISTIC end-to-end: zonal stats carry only exact integer
  * channel sums into the aggregate, and Gi* does all its floating-point math
  * in ONE fixed expression dag over exact BIGINT totals, so a DuckDB oracle
  * evaluating the identical dag reproduces every output bit.
  */
object GeoStatsOps {

  /** Zonal image statistics: per-zone aggregates of DECODED pixel values —
    * the canonical raster/vector assignment of a geo imagery corpus ("how
    * bright / what color is the average pixel captured inside each city").
    *
    * Pipeline shape (the 100 TB path):
    *   1. decode each lossless image ONCE, map-side, in a partition-batched
    *      typed island (same pattern as ImageOps.decodeFeatures) and reduce
    *      it immediately to four integers (npx, Σr, Σg, Σb) — image bytes
    *      never survive past their own partition, so the shuffle carries
    *      ~40 bytes/image regardless of image size;
    *   2. assign the zone by broadcast point-in-polygon on the geotag;
    *   3. ONE partial-aggregated groupBy(zone).
    *
    * Restricted to lossless formats (bmp/png) by contract: their decode is
    * bit-exact, so the per-zone sums are engine-independent integers (a
    * DuckDB oracle rebuilds the splitmix source pixels from the closed form
    * and must match exactly). Lossy formats would make the sums
    * codec-version-dependent; they are verified separately by the PSNR gate
    * (ImageOps.psnrVsSource), not aggregated here.
    *
    * Means are reported in integer micro-units ((1e6·Σ)÷npx, integral DIV) —
    * exact cross-engine. (Σ·1e6 fits a long up to ~3.6e10 decoded 256-px
    * images per zone; a planetary corpus would widen the mean step, and only
    * it, to DECIMAL.)
    *
    * Input: (image_id, fmt, bytes, lat, lon). Output: one row per zone
    * (zone, n_images, n_px, sum_r, sum_g, sum_b, mean_r/g/b_micro).
    */
  def zonalImageStats(spark: SparkSession, images: DataFrame,
      polys: Array[(String, Array[Array[Double]])],
      defaultZone: String = "Unincorporated"): DataFrame = {
    import spark.implicits._
    val sums = images
      .filter(col("fmt").isin("bmp", "png")) // lossless: decode is bit-exact
      .select("image_id", "fmt", "bytes", "lat", "lon")
      .as[(String, String, Array[Byte], Double, Double)]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes, lat, lon) =>
          val (rgb, w, h) = Codec.decodeAny(fmt, bytes).getOrElse(
            throw new IllegalStateException(s"lossless decode failed for $id ($fmt)"))
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i < rgb.length) {
            r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
            i += 3
          }
          (id, lat, lon, (w * h).toLong, r, g, b)
        }
      }
      .toDF("image_id", "lat", "lon", "npx", "px_r", "px_g", "px_b")
    sums
      .withColumn("zone",
        fns.point_in_polygon_first(col("lat"), col("lon"), polys, defaultZone))
      .groupBy(col("zone"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("npx")).as("n_px"),
        sum(col("px_r")).as("sum_r"),
        sum(col("px_g")).as("sum_g"),
        sum(col("px_b")).as("sum_b"))
      .select(col("zone"), col("n_images"), col("n_px"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        expr("sum_r * 1000000 DIV n_px").as("mean_r_micro"),
        expr("sum_g * 1000000 DIV n_px").as("mean_g_micro"),
        expr("sum_b * 1000000 DIV n_px").as("mean_b_micro"))
  }

  /** Global Moran's I (Moran, Biometrika 1950 — public): ONE spatial-
    * autocorrelation statistic for the whole tile raster — "is density
    * clustered, dispersed, or random" — the global complement of the local
    * Gi* below. Binary 8-neighbor contiguity (self excluded), computed
    * entirely from exact BIGINT sufficient statistics:
    *
    *   I = (N/W) · Σ_pairs (x_i−x̄)(x_j−x̄) / Σ_i (x_i−x̄)²
    *     = (N/W) · (P − 2·x̄·Si + W·x̄²) / (S2 − N·x̄²)
    *
    * with N tiles, W ordered neighbor pairs, P = Σ n_i·n_j over pairs,
    * Si = Σ n_i over pairs, S1/S2 the count moments — five integers and one
    * fixed double dag, mirrored verbatim in the oracle.
    *
    * Scale shape: tile counts = one partial aggregate; pairs = the same
    * 9-offset packed-id equi-join as Gi* (minus self); both reductions are
    * distributed and only SIX scalars reach the driver (BM25 pattern),
    * re-emitted as one literal row. Output: one row
    * (n_tiles, w_pairs, p_sum, si_sum, s1_sum, s2_sum, moran_micro).
    */
  def moranI(points: DataFrame, zoom: Int): DataFrame = {
    val tiles = points
      .select(fns.tile_id(col("lat"), col("lon"), zoom).as("tile_id"))
      .groupBy(col("tile_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // reused 3x: moments, probe side, neighbor side
    val offArray = (for (du <- -1 to 1; dv <- -1 to 1 if du != 0 || dv != 0)
      yield s"struct(CAST($du AS BIGINT) AS du, CAST($dv AS BIGINT) AS dv)")
      .mkString("array(", ", ", ")")
    val pairs = tiles
      .select(col("n").as("ni"), col("tile_id"), explode(expr(offArray)).as("o"))
      .select(col("ni"),
        (col("tile_id") + col("o.du") * lit(67108864L) + col("o.dv")).as("nbr_id"))
      .join(tiles.select(col("tile_id").as("nbr_id"), col("n").as("nj")), "nbr_id")
    val pa = pairs.agg(count(lit(1)).as("wp"),
      sum(col("ni") * col("nj")).as("p"), sum(col("ni")).as("si")).head()
    val ta = tiles.agg(count(lit(1)).as("nt"),
      sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2")).head()
    points.sparkSession.range(1).select(
        lit(ta.getLong(0)).as("n_tiles"), lit(pa.getLong(0)).as("w_pairs"),
        lit(pa.getLong(1)).as("p_sum"), lit(pa.getLong(2)).as("si_sum"),
        lit(ta.getLong(1)).as("s1_sum"), lit(ta.getLong(2)).as("s2_sum"))
      .select(col("n_tiles"), col("w_pairs"), col("p_sum"), col("si_sum"),
        col("s1_sum"), col("s2_sum"),
        // ONE fixed double dag over exact BIGINTs — mirrored verbatim in SQL
        expr("""CASE WHEN n_tiles > 1 AND w_pairs > 0 AND
            CAST(s2_sum AS DOUBLE) - CAST(n_tiles AS DOUBLE)
              * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE))
              * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE)) > 0.0D
          THEN CAST(ROUND(
            (CAST(n_tiles AS DOUBLE) / CAST(w_pairs AS DOUBLE))
            * (CAST(p_sum AS DOUBLE)
               - 2.0D * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE)) * CAST(si_sum AS DOUBLE)
               + CAST(w_pairs AS DOUBLE)
                 * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE))
                 * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE)))
            / (CAST(s2_sum AS DOUBLE) - CAST(n_tiles AS DOUBLE)
               * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE))
               * (CAST(s1_sum AS DOUBLE)/CAST(n_tiles AS DOUBLE)))
            * 1000000.0D) AS BIGINT)
          ELSE CAST(NULL AS BIGINT) END""").as("moran_micro"))
  }

  /** Geofence enter/exit transitions over trajectories: explode each track
    * to (step, point), assign the zone by broadcast point-in-polygon, and
    * emit a row wherever consecutive steps change zone — the event stream a
    * fleet/geo-analytics pipeline derives from raw GPS ("vehicle entered
    * beta at step 17").
    *
    * Scale shape: the explode and PIP are map-side; ONE shuffle partitions
    * by track for the lag window, whose per-track frame is the track length
    * (bounded), carrying only (track_id, step, zone)-sized rows. Output:
    * (track_id, step, from_zone, to_zone) for every transition.
    */
  def geofenceTransitions(tracks: DataFrame,
      polys: Array[(String, Array[Array[Double]])],
      defaultZone: String = "Unincorporated"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("track_id")).orderBy(col("step"))
    tracks
      .select(col("track_id"), posexplode(col("geometry")).as(Seq("step", "pt")))
      .select(col("track_id"), col("step"),
        fns.point_in_polygon_first(col("pt.lat"), col("pt.lon"), polys, defaultZone)
          .as("zone"))
      .withColumn("prev", lag(col("zone"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("zone"))
      .select(col("track_id"), col("step"),
        col("prev").as("from_zone"), col("zone").as("to_zone"))
  }

  /** Getis-Ord Gi* hotspot detection over Web-Mercator tile counts: for each
    * occupied tile, the z-score of its 3×3-neighborhood point-count sum
    * against the global tile-count distribution (binary contiguity weights,
    * self included — the Gi* variant). Classic formula:
    *
    *   Gi* = (Σ_j∈N(i) x_j − x̄·w_i) / (S · sqrt((n·w_i − w_i²)/(n−1)))
    *
    * with n = occupied tiles, x̄/S the global mean/std of tile counts, and
    * w_i = |N(i)∩occupied| (absent tiles carry count 0 and contribute 0 to
    * the neighbor sum; restricting w_i to occupied tiles keeps every input
    * an exact integer).
    *
    * Determinism contract: n, Σx, Σx², w_i, S_i are exact BIGINTs; the
    * z-score is ONE fixed double dag over them (written identically in the
    * DuckDB oracle), reported in rounded integer micro-units.
    *
    * Scale shape: tile counts are one partial-aggregated groupBy (output
    * size = occupied tiles, never points); the neighborhood sum is a 9-way
    * OFFSET EQUI-JOIN on the packed tile id (neighbor id = id + du·2²⁶ + dv
    * — no unpacking, no range join, no wrap needed away from the
    * antimeridian); the three global moments are distributed-aggregated and
    * re-enter the plan as literals (BM25 global-stats pattern). At 10^12
    * points this is the tile-pyramid cost profile, not the corpus's.
    *
    * Input: (lat, lon). Output per occupied tile:
    * (tile_id, n, w_i, s_i, z_micro — null when the variance degenerates).
    */
  def giStarHotspots(points: DataFrame, zoom: Int): DataFrame = {
    val tiles = points
      .select(fns.tile_id(col("lat"), col("lon"), zoom).as("tile_id"))
      .groupBy(col("tile_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // reused 3x: moments, probe side, neighbor side
    // global moments: a fully distributed aggregate whose THREE scalars come
    // back to the driver and re-enter the plan as codegen'd literals (the
    // BM25 global-stats pattern) — no 1-row join shape anywhere
    val g = tiles.agg(
      count(lit(1)).as("nt"),
      sum(col("n")).as("sn"),
      sum(col("n") * col("n")).as("sn2")).head()
    val (nt, sn, sn2) = (g.getLong(0), g.getLong(1), g.getLong(2))
    // 9-offset neighborhood probes via a per-row generator — a join with a
    // 9-row table would plan as BroadcastNestedLoopJoin for no benefit
    val offArray = (for (du <- -1 to 1; dv <- -1 to 1)
      yield s"struct(CAST($du AS BIGINT) AS du, CAST($dv AS BIGINT) AS dv)")
      .mkString("array(", ", ", ")")
    val probe = tiles
      .select(col("tile_id"), explode(expr(offArray)).as("o"))
      .select(col("tile_id"),
        (col("tile_id") + col("o.du") * lit(67108864L) + col("o.dv")).as("nbr_id"))
    val hood = probe
      .join(tiles.select(col("tile_id").as("nbr_id"), col("n").as("nbr_n")), "nbr_id")
      .groupBy(col("tile_id"))
      .agg(count(lit(1)).as("w_i"), sum(col("nbr_n")).as("s_i"))
    tiles.join(hood, "tile_id")
      .withColumn("nt", lit(nt)).withColumn("sn", lit(sn)).withColumn("sn2", lit(sn2))
      .select(col("tile_id"), col("n"), col("w_i"), col("s_i"),
        // ONE fixed double dag over exact BIGINTs — mirrored verbatim in SQL
        expr("""CASE WHEN nt > 1 AND
            SQRT(GREATEST(0.0D, CAST(sn2 AS DOUBLE)/CAST(nt AS DOUBLE)
              - (CAST(sn AS DOUBLE)/CAST(nt AS DOUBLE))*(CAST(sn AS DOUBLE)/CAST(nt AS DOUBLE))))
            * SQRT((CAST(nt AS DOUBLE)*CAST(w_i AS DOUBLE) - CAST(w_i AS DOUBLE)*CAST(w_i AS DOUBLE))
                   /(CAST(nt AS DOUBLE) - 1.0D)) > 0.0D
          THEN CAST(ROUND(
            (CAST(s_i AS DOUBLE) - (CAST(sn AS DOUBLE)/CAST(nt AS DOUBLE))*CAST(w_i AS DOUBLE))
            / (SQRT(GREATEST(0.0D, CAST(sn2 AS DOUBLE)/CAST(nt AS DOUBLE)
                - (CAST(sn AS DOUBLE)/CAST(nt AS DOUBLE))*(CAST(sn AS DOUBLE)/CAST(nt AS DOUBLE))))
               * SQRT((CAST(nt AS DOUBLE)*CAST(w_i AS DOUBLE) - CAST(w_i AS DOUBLE)*CAST(w_i AS DOUBLE))
                      /(CAST(nt AS DOUBLE) - 1.0D)))
            * 1000000.0D) AS BIGINT)
          ELSE CAST(NULL AS BIGINT) END""").as("z_micro"))
  }
}
