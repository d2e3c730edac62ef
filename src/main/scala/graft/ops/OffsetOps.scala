package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.Geom

/** X2 linear referencing (reference offset.js:170-244): GPS point at ±N
  * meters along a way from a node, interpolating within the containing
  * segment and continuing across the unique same-named (name ?? ref) way at
  * the terminal node.
  *
  * Distributed shape: the request side scales (one row per (way, node,
  * offset) lookup); the way index is broadcast and walks run per-partition
  * (bounded recursion, same as the reference's in-memory maps). At planet
  * scale the index would become a bucketed join on way_id with iterative
  * continuation rounds; the per-partition walk is the single-region design.
  */
object OffsetOps {

  case class WayRec(id: Long, name: String, nodes: Array[Long], flat: Array[Double])

  /** requests: (way_id long, node_id long, offset_m double).
    * Output: request cols + (olat, olon) or nulls when the walk runs off the
    * network (reference returns null, offset.js:157-160). */
  def offsetAlong(spark: SparkSession, rawWays: DataFrame, requests: DataFrame,
                  maxHops: Int = 16): DataFrame = {
    import spark.implicits._
    val ways: Array[WayRec] = rawWays.filter(col("tags").isNotNull)
      .select(col("id"),
        coalesce(col("tags").getItem("name"), col("tags").getItem("ref")).as("nameOrRef"),
        col("nodes"),
        flatten(transform(col("geometry"), g =>
          array(g.getField("lat"), g.getField("lon")))).as("flat"))
      .as[(Long, String, Array[Long], Array[Double])]
      .collect()
      .map { case (id, n, nodes, flat) => WayRec(id, n, nodes, flat) }
    val byId = ways.map(w => w.id -> w).toMap
    // node -> ways containing it (mapNodeIdToWays analog), input order
    val byNode = scala.collection.mutable.HashMap.empty[Long, List[WayRec]]
    ways.foreach(w => w.nodes.foreach(n => byNode(n) = w :: byNode.getOrElse(n, Nil)))
    val byNodeArr = byNode.map { case (k, v) => k -> v.reverse.toArray }.toMap
    val bIdx = spark.sparkContext.broadcast((byId, byNodeArr))

    def fix6(x: Double): Double = math.round(x * 1e6) / 1e6

    def walk(wayId: Long, nodeId: Long, meters: Double, depth: Int): Option[(Double, Double)] = {
      if (depth > maxHops) return None
      val (idx, nodeIdx) = (bIdx.value._1, bIdx.value._2)
      val way = idx.getOrElse(wayId, return None)
      val nodeIndex = way.nodes.indexOf(nodeId)
      if (nodeIndex < 0) return None
      val g = way.flat
      val n = way.nodes.length
      // per-segment haversine distances, fix6 (offset.js:107-117)
      def segDist(i: Int): Double =
        fix6(Geom.haversineM(g(2 * i), g(2 * i + 1), g(2 * i + 2), g(2 * i + 3)))
      var distSoFar = 0.0
      if (meters >= 0) {
        var i = nodeIndex
        while (i < n - 1) {
          val d = segDist(i)
          if (d + distSoFar >= meters) {
            val w2 = (meters - distSoFar) / d
            return Some((fix6((1 - w2) * g(2 * i) + w2 * g(2 * i + 2)),
              fix6((1 - w2) * g(2 * i + 1) + w2 * g(2 * i + 3))))
          }
          distSoFar += d
          i += 1
        }
        nextWay(way, way.nodes(n - 1)) match {
          case Some(nw) => walk(nw.id, way.nodes(n - 1), meters - distSoFar, depth + 1)
          case None => None
        }
      } else {
        val pos = -meters
        var i = nodeIndex - 1
        while (i >= 0) {
          val d = segDist(i)
          if (d + distSoFar >= pos) {
            val w2 = (pos - distSoFar) / d
            // interpolate from the upper node backward (offset.js:212-216)
            return Some((fix6((1 - w2) * g(2 * i + 2) + w2 * g(2 * i)),
              fix6((1 - w2) * g(2 * i + 3) + w2 * g(2 * i + 1))))
          }
          distSoFar += d
          i -= 1
        }
        nextWay(way, way.nodes(0)) match {
          case Some(nw) => walk(nw.id, way.nodes(0), meters + distSoFar, depth + 1)
          case None => None
        }
      }
    }

    def nextWay(way: WayRec, nodeId: Long): Option[WayRec] = {
      val cands = bIdx.value._2.getOrElse(nodeId, Array.empty[WayRec])
      val others = cands.filter(w => w.id != way.id && w.name == way.name && w.name != null)
      if (others.length == 1) Some(others(0)) else None // unique continuation only (offset.js:155-165)
    }

    requests.select(col("way_id"), col("node_id"), col("offset_m"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        it.map { case (w, nd, m) =>
          walk(w, nd, m, 0) match {
            case Some((la, lo)) => (w, nd, m, Option(la), Option(lo))
            case None => (w, nd, m, None: Option[Double], None: Option[Double])
          }
        }
      }
      .toDF("way_id", "node_id", "offset_m", "olat", "olon")
  }
}
