package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.exprs._

/** SQL surface for the library's native expressions: `graft_*` functions
  * registered via SparkSessionExtensions.injectFunction (session build) or
  * FunctionBridge (live session, used by GraftPlans.enable). Everything a
  * DataFrame user reaches through graft.exprs.fns is reachable from
  * spark.sql(...) strings with identical semantics — the builders construct
  * the very same Catalyst expressions, so plans and codegen are identical.
  *
  * Static parameters (resolution, level, zoom, k) must be INT literals: they
  * select precomputed tables / codegen constants inside the expressions.
  */
object GraftFunctions {

  private def intLit(fn: String, e: Expression, pos: Int): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an INTEGER literal, got $other")
  }

  private def entry(name: String, usage: String, arity: Int)
                   (builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val checked: Seq[Expression] => Expression = { args =>
      require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
      builder(args)
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(s"graft.exprs ($usage)", name), checked)
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("graft_cell_encode", "grid cell id of (lat, lon) at res decimal digits", 3) {
      a => CellEncode(a(0), a(1), intLit("graft_cell_encode", a(2), 3)) },
    entry("graft_cells_covering", "cells covered by the bbox at res", 5) {
      a => CellsCovering(a(0), a(1), a(2), a(3), intLit("graft_cells_covering", a(4), 5)) },
    entry("graft_cell_disk",
      "cells at Chebyshev distance <= k at grid res; wraps across the antimeridian", 3) {
      a => CellDisk(a(0), a(1), intLit("graft_cell_disk", a(2), 3)) },
    entry("graft_cell_disk_rect",
      "rectangular cell disk (kLon, kLat half-widths) at grid res; wraps across the antimeridian", 4) {
      a => CellDiskRect(a(0), a(1), a(2), intLit("graft_cell_disk_rect", a(3), 4)) },
    entry("graft_gmap_url", "reference gmapUrl(): padded 'lat,lon' string (F13)", 2) {
      a => GmapUrl.expr(a(0), a(1)) },
    entry("graft_cell_parent", "parent cell at a coarser res", 3) {
      a => CellParent(a(0), intLit("graft_cell_parent", a(1), 2),
        intLit("graft_cell_parent", a(2), 3)) },
    entry("graft_s2_cell", "S2 cell id at level (0-30)", 3) {
      a => S2CellEncode(a(0), a(1), intLit("graft_s2_cell", a(2), 3)) },
    entry("graft_hex7_cell",
      "hex cell id at res (0-15); H3-STYLE clean-room index — ids NOT interchangeable with official H3 (20 base faces vs canonical 122)", 3) {
      a => Hex7CellEncode(a(0), a(1), intLit("graft_hex7_cell", a(2), 3)) },
    entry("graft_tile_id", "packed Web-Mercator tile id at zoom", 3) {
      a => TileId(a(0), a(1), intLit("graft_tile_id", a(2), 3)) },
    entry("graft_geohash", "base-32 geohash at precision (1-12)", 3) {
      a => GeohashEncode(a(0), a(1), intLit("graft_geohash", a(2), 3)) },
    entry("graft_haversine_m", "great-circle meters between two points", 4) {
      a => Haversine(a(0), a(1), a(2), a(3)) },
    entry("graft_point_seg_dist", "planar point-to-segment distance (degrees)", 6) {
      a => org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[graft.geom.Geom.type], DoubleType, "pointSegDist", a,
        propagateNull = true) },
    entry("graft_clean_street_key", "reference clean(): first-only _d strip", 1) {
      a => CleanStreetKey(a(0)) },
    entry("graft_simhash64", "64-bit SimHash of a token array", 1) {
      a => SimHash64(a(0)) },
    entry("graft_minhash_sig", "k-permutation MinHash signature of a token array", 2) {
      a => MinHashSig(a(0), intLit("graft_minhash_sig", a(1), 2)) },
    entry("graft_rolling_min_hash", "winnowing rolling-hash fingerprint", 2) {
      a => RollingMinHash(a(0), intLit("graft_rolling_min_hash", a(1), 2)) },
    entry("graft_cosine_sim", "cosine similarity of two float vectors", 2) {
      a => CosineSim(a(0), a(1)) },
    entry("graft_point_in_polygon",
      "ray-cast containment against a rings column (array<array<double>>, flat [lon,lat,...])", 3) {
      a => PointInPolygon(a(0), a(1), a(2)) },
    entry("graft_point_polyline_dist",
      "min planar distance (degrees) from a point to an array<struct<lat,lon>> polyline", 3) {
      a => PointPolylineDist(a(0), a(1), a(2)) },
    entry("graft_clip_rect_area",
      "polygon ∩ axis-aligned-rect area (deg²): rings, latLo, lonLo, latHi, lonHi", 5) {
      a => org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[graft.geom.Geom.type], DoubleType, "clipRectAreaData", a,
        propagateNull = true) },
    entry("graft_convex_hull_uv",
      "convex hull (monotone chain) of array<struct<u:bigint,v:bigint>> points", 1) {
      a => org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[graft.geom.Hull.type], fns.uvPairTypePublic, "hullData", a,
        propagateNull = true) },
    entry("graft_hull_diam2",
      "exact squared diameter of a (u,v) point set via its hull", 1) {
      a => org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[graft.geom.Hull.type], org.apache.spark.sql.types.LongType,
        "diam2Data", a, propagateNull = true) },
    entry("graft_hull_area2",
      "twice the convex-hull area of a (u,v) point set (exact integer)", 1) {
      a => org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[graft.geom.Hull.type], org.apache.spark.sql.types.LongType,
        "area2Data", a, propagateNull = true) },
    // aggregate: the registry builder returns the AggregateFunction itself;
    // the analyzer wraps it in an AggregateExpression like any built-in agg
    entry("graft_hll_distinct", "HyperLogLog distinct estimate (2^p registers)", 2) {
      a => HllDistinct(a(0), intLit("graft_hll_distinct", a(1), 2)) },
    entry("graft_topk_agg",
      "exact top-k (value DESC, tag ASC) pairs per group, k-bounded state", 3) {
      a => TopKAgg(a(0), a(1), intLit("graft_topk_agg", a(2), 3)) },
    entry("graft_bloom_agg",
      "Bloom filter of the input keys as array<bigint> words (bits, k hashes)", 3) {
      a => BloomAgg(a(0), intLit("graft_bloom_agg", a(1), 2),
        intLit("graft_bloom_agg", a(2), 3)) }
  )
}
