package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Way preparation: derived names (F1, geo.js:171-186), motorway_link name
  * propagation fixpoint (X1, geo.js:445-544), JUNCTION fake names (A10,
  * geo.js:554-593), and dead-end detection (A7, geo.js:599-656) — all as
  * declarative DataFrame transforms; only the X1 fixpoint is a driver loop
  * (label propagation, one Spark job per round, localCheckpoint per round).
  *
  * Output wayData columns: way_id, name, highway, nodes, geometry, way_pos
  * (insertion-order key reproducing the reference's array push order: named
  * ways first in input order, then X1-named links, then fake-named ways).
  */
object WayOps {

  /** F1 `getWayName`: tags.name then each ';'-token of tags.ref, joined with
    * ';'. Since split+join on the same delimiter is identity, this reduces to
    * concat_ws over the non-empty of (name, ref). Empty string when neither.
    */
  def wayName(tags: Column): Column =
    concat_ws(";", nullif(tags.getItem("name"), lit("")), nullif(tags.getItem("ref"), lit("")))

  /** all tagged ways with a stable input position (way_pos). Position is the
    * way's rank in input order; we use way id order as the deterministic
    * proxy (documented divergence: the reference uses file order).
    */
  private def withPos(ways: DataFrame): DataFrame =
    ways.filter(col("tags").isNotNull)
      .withColumn("way_pos", col("id"))

  /** X1 + A10: returns wayData (way_id, name, highway, nodes, geometry,
    * way_pos, src) where src ∈ {named, link, fake}.
    */
  def deriveWayData(spark: SparkSession, ways: DataFrame, maxIter: Int = 20): DataFrame = {
    val tagged = withPos(ways)
      .select(col("id").as("way_id"),
        wayName(col("tags")).as("fname"),
        col("tags").getItem("highway").as("highway"),
        col("tags").getItem("name").as("tag_name"),
        col("tags").getItem("ref").as("tag_ref"),
        col("nodes"), col("geometry"), col("way_pos"))
      .localCheckpoint() // synth lineage is deep; cut it once

    val named = tagged.filter(length(col("fname")) > 0)
      .select(col("way_id"), col("fname").as("name"), col("highway"),
        col("nodes"), col("geometry"), col("way_pos"), lit("named").as("src"))

    // --- X1 fixpoint: unnamed motorway_links take ref of an adjacent
    // motorway or name of an adjacent named link (first/last node, first
    // matching way in input order), repeated until no progress.
    var links = tagged.filter(col("highway") === "motorway_link" && col("tag_name").isNull)
      .select(col("way_id"), col("highway"), col("nodes"), col("geometry"), col("way_pos"),
        element_at(col("nodes"), 1).as("first_node"),
        element_at(col("nodes"), -1).as("last_node"))
      .localCheckpoint()
    // naming sources present from the start: motorways with ref; named links
    val motorwaySrc = tagged
      .filter(col("highway") === "motorway" && col("tag_ref").isNotNull)
      .select(col("way_pos"), col("tag_ref").as("src_name"), explode(col("nodes")).as("node"))
    val namedLinkSrc0 = tagged
      .filter(col("highway") === "motorway_link" && col("tag_name").isNotNull)
      .select(col("way_pos"), col("tag_name").as("src_name"), explode(col("nodes")).as("node"))
    var sources = motorwaySrc.unionByName(namedLinkSrc0).localCheckpoint()

    var resolved = spark.emptyDataFrame
    var resolvedInit = false
    var remaining = links.count()
    var iter = 0
    var progress = true
    while (remaining > 0 && progress && iter < maxIter) {
      // first matching source way per node, by input order
      val perNode = sources.groupBy("node")
        .agg(min_by(col("src_name"), col("way_pos")).as("node_name"))
      val cand = links
        .join(perNode.withColumnRenamed("node", "fn").withColumnRenamed("node_name", "name_first"),
          links("first_node") === col("fn"), "left")
        .join(perNode.withColumnRenamed("node", "ln").withColumnRenamed("node_name", "name_last"),
          links("last_node") === col("ln"), "left")
        .withColumn("new_name", coalesce(col("name_first"), col("name_last")))
      val newlyNamed = cand.filter(col("new_name").isNotNull)
        .select(col("way_id"), col("new_name").as("name"), col("highway"),
          col("nodes"), col("geometry"), col("way_pos"),
          col("first_node"), col("last_node"))
        .localCheckpoint()
      val n = newlyNamed.count()
      if (n == 0) progress = false
      else {
        val newRows = newlyNamed.drop("first_node", "last_node")
        resolved = if (resolvedInit) resolved.unionByName(newRows) else newRows
        resolvedInit = true
        links = cand.filter(col("new_name").isNull)
          .select(col("way_id"), col("highway"), col("nodes"), col("geometry"),
            col("way_pos"), col("first_node"), col("last_node"))
          .localCheckpoint()
        sources = sources.unionByName(
          newlyNamed.select(col("way_pos"), col("name").as("src_name"),
            explode(col("nodes")).as("node"))).localCheckpoint()
        remaining -= n
      }
      iter += 1
    }
    // X1-named links are pushed after all named ways (reference push order)
    val linkRows =
      if (resolvedInit)
        resolved.select(col("way_id"), col("name"), col("highway"),
          col("nodes"), col("geometry"),
          (col("way_pos") + 1000000000L).as("way_pos"), lit("link").as("src"))
      else named.limit(0)

    // --- A10 fake names for still-unnamed ways: sorted union of adjacent
    // named-way names + sentinel ('motorway_link' for unnamed links that X1
    // could not name, 'JUNCTION' otherwise).
    val namedSoFar = named.unionByName(linkRows)
    val nodeNames = namedSoFar
      .select(explode(col("nodes")).as("node"), col("name"))
      .groupBy("node").agg(collect_set(col("name")).as("nnames"))
    val unnamed = tagged.filter(length(col("fname")) === 0)
      .join(linkRows.select(col("way_id")).withColumn("was_named", lit(true)),
        Seq("way_id"), "left_anti")
    val fakeRows = unnamed
      .select(col("way_id"), col("highway"), col("nodes"), col("geometry"), col("way_pos"),
        posexplode(col("nodes")))
      .withColumnRenamed("col", "node")
      .join(nodeNames, Seq("node"), "left")
      .groupBy("way_id", "highway", "nodes", "geometry", "way_pos")
      .agg(array_sort(array_distinct(concat(
        array(when(col("highway") === "motorway_link", lit("motorway_link"))
          .otherwise(lit("JUNCTION"))),
        flatten(collect_list(coalesce(col("nnames"), array().cast("array<string>"))))
      ))).as("names_arr"))
      .select(col("way_id"), concat_ws("/", col("names_arr")).as("name"), col("highway"),
        col("nodes"), col("geometry"),
        (col("way_pos") + 2000000000L).as("way_pos"), lit("fake").as("src"))

    named.unionByName(linkRows).unionByName(fakeRows)
  }

  /** A7 dead ends: street name toggled per way endpoint; names with odd
    * endpoint count at a node dead-end there (geo.js:599-651).
    * Input: wayData named rows (src != fake — the reference computes this via
    * getWayName over post-X1 tags, so X1-named links participate).
    * Output: (node, dead_names array<string>) — nodes with ≥1 dead-end name.
    */
  def deadEnds(wayData: DataFrame): DataFrame = {
    val named = wayData.filter(col("src") =!= "fake" && size(col("nodes")) >= 2)
    val endpoints = named.select(element_at(col("nodes"), 1).as("node"), col("name"))
      .unionAll(named.select(element_at(col("nodes"), -1).as("node"), col("name")))
    endpoints.groupBy("node", "name").count()
      .filter(col("count") % 2 === 1)
      .groupBy("node").agg(sort_array(collect_set(col("name"))).as("dead_names"))
  }

  /** per-node memberships over ALL wayData rows (used by onSameWay,
    * geo.js:359-372): (node, ways array<struct<way_id,name>>). */
  def nodeMemberships(wayData: DataFrame): DataFrame =
    wayData.select(explode(col("nodes")).as("node"),
        struct(col("way_id"), col("name")).as("m"))
      .groupBy("node").agg(collect_set(col("m")).as("memberships"))
}
