package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.exprs.fns
import graft.geom.Geom

/** Working row for the order-sensitive coalescing stages (A4/A6). */
case class Memb(way_id: Long, name: String)
case class TopoRow(
    lat: Double, lon: Double, raw: String, streets: String,
    wayIds: Seq[Long], nodeId: Long, ord: Long,
    deadNames: Seq[String], memberships: Seq[Memb])

/** Topological intersection finding (SURVEY J1/A1/P5/P6/W1/A4/A5/A6):
  * reference `findintersections` geo.js:1136-1223 + coalescing
  * geo.js:738-967. The core is a hash aggregation (groupBy node →
  * collect_set(name)) — exactly the reference's Map<node, Set<name>> made
  * explicit as a shuffle. The greedy 50 m clustering (A6) is an
  * order-sensitive typed island (groupByKey.flatMapGroups) because its
  * semantics (greedy first-element clusters, early-return neighbor pairing,
  * geo.js:827-967) are not relational.
  */
object TopoIntersections {

  /** Full topological pipeline. Inputs: wayData (WayOps.deriveWayData) and
    * the raw ways table. Output columns:
    * lat, lon, raw, streets, wayIds array<long>, nodeId long, ord.
    */
  def apply(spark: SparkSession, wayData: DataFrame, rawWays: DataFrame): DataFrame = {
    import spark.implicits._

    // ONE explode + ONE groupBy(node) per source table (was 6 separate
    // explode→shuffle→aggregate passes + 5 node joins in round 1 — at scale
    // the shuffle volume of the exploded node table dominates this job, so
    // every per-node aggregate that shares a source must share its pass):
    //
    // wayData pass: names set + first-insertion order (J1/A1/W1), first-
    // occurrence gps (mapNodeIdToGps), memberships (onSameWay), and the A7
    // dead-end parity (endpoint occurrences per name, odd count = dead end —
    // computed from the per-node endpoint-name list, which is degree-bounded).
    val n = size(col("nodes"))
    val exploded = wayData
      .select(col("way_pos"), col("way_id"), col("name"), col("src"), n.as("n"),
        posexplode(arrays_zip(col("nodes"), col("geometry"))))
      .select(col("name"), col("way_id"),
        col("col.nodes").as("node"),
        col("col.geometry.lat").as("lat"), col("col.geometry.lon").as("lon"),
        (col("way_pos") * 1000000L + col("pos")).as("okey"),
        // endpoint of a named non-fake way with >=2 nodes (WayOps.deadEnds)
        (col("src") =!= "fake" && col("n") >= 2 &&
          (col("pos") === 0 || col("pos") === col("n") - 1)).as("is_end"))
    val wdAgg = exploded.groupBy("node")
      .agg(
        collect_set(col("name")).as("names"),
        min(col("okey")).as("ord"),
        min_by(struct(col("lat"), col("lon")), col("okey")).as("g"),
        collect_set(struct(col("way_id"), col("name"))).as("memberships"),
        collect_list(when(col("is_end"), col("name"))).as("end_names"))
      .filter(size(col("names")) > 1)
      .withColumn("dead_names",
        sort_array(filter(array_distinct(col("end_names")),
          nm => size(filter(col("end_names"), x => x === nm)) % 2 === 1)))
      .select(col("node"), col("names"), col("ord"),
        col("g.lat").as("lat"), col("g.lon").as("lon"),
        col("memberships"), col("dead_names"))

    // rawWays pass: per-node highway types (P5/P6, mapNodeIdToWays) + the
    // wayIds output column (all tagged ways touching the node, geo.js:1132)
    val tagged = rawWays.filter(col("tags").isNotNull)
    val rawAgg = tagged
      .select(explode(col("nodes")).as("node"), col("id"),
        col("tags").getItem("highway").as("hw"))
      .groupBy("node").agg(
        collect_set(col("hw")).as("hws"),
        sort_array(collect_set(col("id"))).as("wayIds"))

    val wIntString = Window.partitionBy("intString").orderBy("ord")
    // single node-keyed join (both aggregation outputs are hash partitioned
    // on node — no extra exchange), THEN the intString windows (one reshuffle)
    val ints0 = wdAgg
      .join(rawAgg, Seq("node"))
      // P5: not all motorway_links (geo.js:1098-1108)
      .filter(exists(col("hws"), h => h =!= "motorway_link"))
      // P6: not all motorway+links (geo.js:1111-1123)
      .filter(!forall(col("hws"), h => h === "motorway" || h === "motorway_link"))
      .withColumn("intString", concat_ws("/", array_sort(col("names"))))
      .withColumn("rn", row_number().over(wIntString))
      .withColumn("mx", max(col("rn")).over(Window.partitionBy("intString")))
      // W1 suffixing (geo.js:1176-1184): 2nd..9th get _2.._9; ≥10th
      // overwrites the unsuffixed map entry (last one wins)
      .filter(col("rn") <= 9 || col("rn") === col("mx"))
      .filter(!(col("mx") >= 10 && col("rn") === 1))
      .withColumn("raw",
        when(col("rn") === 1 || col("rn") >= 10, col("intString"))
          .otherwise(concat(col("intString"), lit("_"), col("rn"))))
      .withColumn("streets", fns.clean_street_key(col("raw")))
      .select(col("lat"), col("lon"), col("raw"), col("streets"), col("wayIds"),
        col("node").as("nodeId"), col("ord"),
        coalesce(col("dead_names"), array().cast("array<string>")).as("deadNames"),
        col("memberships"))
      // A4/A6 each split-and-union this relation (2×2 downstream branches);
      // persist so the subtree executes once, not four times
      .cache()

    if (sys.env.contains("GRAFT_PROFILE")) {
      def t[T](n: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        System.err.println(f"[profile]     topo/$n%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
      }
      t("ints0")(ints0.cache().count())
      val aj = averageJunctionDuplicates(ints0).cache()
      t("afterJunction")(aj.count())
      val co = averageNearbyDuplicates(spark, aj).cache()
      t("coalesced")(co.count())
      val rj = removeJunctions(co)
      t("removeJunctions")(rj.count())
      rj
    } else {
      val afterJunction = averageJunctionDuplicates(ints0).cache()
      val coalesced = averageNearbyDuplicates(spark, afterJunction)
      removeJunctions(coalesced)
    }
  }

  /** A4 (geo.js:738-766): JUNCTION-named intersections with identical streets
    * collapse to one averaged point; first row (by streets sort, ties by
    * insertion) supplies raw/streets/nodeId. */
  def averageJunctionDuplicates(ints: DataFrame): DataFrame = {
    val isJ = col("streets").contains("JUNCTION")
    val simple = ints.filter(!isJ)
    val junction = ints.filter(isJ)
      .groupBy(col("streets"))
      .agg(
        avg(col("lat")).as("lat"), avg(col("lon")).as("lon"),
        min_by(col("raw"), col("ord")).as("raw"),
        sort_array(array_distinct(flatten(collect_list(col("wayIds"))))).as("wayIds"),
        min_by(col("nodeId"), col("ord")).as("nodeId"),
        min(col("ord")).as("ord"),
        min_by(col("deadNames"), col("ord")).as("deadNames"),
        min_by(col("memberships"), col("ord")).as("memberships"))
      .select(simple.columns.map(col).toIndexedSeq: _*)
    simple.unionByName(junction)
  }

  /** A5+A6 (geo.js:904-967): singleton streets pass through; duplicate
    * streets go through greedy 50 m clustering with dead-end rules.
    * Duplicate groups are tiny (same street-pair) → typed flatMapGroups. */
  def averageNearbyDuplicates(spark: SparkSession, ints: DataFrame): DataFrame = {
    import spark.implicits._
    val counted = ints.withColumn("ct", count(lit(1)).over(Window.partitionBy("streets")))
      .cache() // consumed by both the singles and dupes branches
    val singles = counted.filter(col("ct") === 1).drop("ct")
    val dupes = counted.filter(col("ct") > 1).drop("ct")
      .as[TopoRow]
      .groupByKey(_.streets)
      .flatMapGroups((_: String, it: Iterator[TopoRow]) => greedyCluster(it.toSeq))
    singles.unionByName(dupes.toDF())
  }

  private def manhattan(a: TopoRow, b: TopoRow): Double =
    Geom.manhattanDeg(a.lat, a.lon, b.lat, b.lon)

  /** avgGps (geo.js:712-732): mean coords, union of wayIds, first row's
    * raw/streets/nodeId (and our carried deadNames/memberships/ord). */
  private def avgRows(rows: Seq[TopoRow]): TopoRow = {
    val n = rows.length
    val h = rows.head
    TopoRow(
      rows.map(_.lat).sum / n, rows.map(_.lon).sum / n,
      h.raw, h.streets,
      rows.flatMap(_.wayIds).distinct.sorted,
      h.nodeId, h.ord, h.deadNames, h.memberships)
  }

  /** onSameWay (geo.js:359-372): some way contains both nodes and its name is
    * in the dead-end street set. */
  private def onSameWay(n: TopoRow, m: TopoRow, strSet: Set[String]): Boolean =
    n.memberships.exists(w =>
      strSet.contains(w.name) && m.memberships.exists(_.way_id == w.way_id))

  /** processCloseGroup (geo.js:827-903), bug-faithful including the early
    * return after the first neighbor pairing and findNeighbor possibly
    * matching the dead-end row itself. */
  private def processCloseGroup(close: Seq[TopoRow]): Seq[TopoRow] = {
    if (close.length <= 1) return close
    val deadEndCount = close.count(_.deadNames.nonEmpty)
    if (deadEndCount == 0) return Seq(avgRows(close))
    if (close.length == 2) {
      if (deadEndCount == 1) {
        return if (manhattan(close(0), close(1)) < 50) Seq(avgRows(close)) else close
      }
      if (deadEndCount == 2) return close
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[TopoRow]
    for (m <- close if m.deadNames.nonEmpty) {
      val strSet = m.deadNames.toSet
      close.find(n => onSameWay(n, m, strSet)) match {
        case Some(other) => out += avgRows(Seq(other, m)); return out.toSeq
        case None => out += m
      }
    }
    out.toSeq
  }

  /** greedy clustering loop (geo.js:939-962): repeatedly sort remaining rows
    * by distance from the first, take the <50 m prefix as a group. */
  def greedyCluster(rows: Seq[TopoRow]): Seq[TopoRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TopoRow]
    var matches = rows.sortBy(_.ord) // insertion order
    while (matches.nonEmpty) {
      val base = matches.head
      val sorted = matches.sortBy(m => manhattan(m, base)) // stable sort
      val close = sorted.filter(m => manhattan(m, base) < 50)
      out ++= processCloseGroup(close)
      matches = sorted.drop(close.length)
    }
    out.toSeq
  }

  /** removeJUNCTIONS (geo.js:778-799): drop the fake token; keep only rows
    * with ≥2 remaining street tokens. */
  def removeJunctions(ints: DataFrame): DataFrame =
    ints
      .withColumn("toks", filter(split(col("streets"), "/"), t => t =!= "JUNCTION"))
      .filter(size(col("toks")) > 1)
      .withColumn("streets", concat_ws("/", col("toks")))
      .drop("toks")
}
