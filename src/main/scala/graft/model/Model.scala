package graft.model

/** Typed row models (SURVEY.md §1.2). Schemas are explicit — the reference is
  * schema-implicit JSON (`geo.js:1285`); we pin types for Datasets/Encoders.
  */

/** OSM-shaped way row (reference fixture shape: gpsBins.js:253-357). */
case class LatLon(lat: Double, lon: Double)
case class Way(
    id: Long,
    nodes: Array[Long],
    geometry: Array[LatLon],
    tags: Map[String, String])

/** Working projection (geo.js:440). */
case class WayData(
    way_id: Long,
    name: String,
    highway: String,
    nodes: Array[Long],
    geometry: Array[LatLon])

/** Image+caption row, exact input_hint shape (BASELINE.json). */
case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** Boundary polygon: rings are flat [lon,lat,...] arrays, outer first
  * (shape per data/cityboundary/Land_Boundary.geojson + geo.js:84-121). */
case class Boundary(name: String, kind: String, rings: Array[Array[Double]])

/** Intersection row (geo.js:301, geo.js:1227-1238). nodeId is the reference's
  * int64-or-'Geom' union rendered as string (SURVEY §1.1 item 3). */
case class Intersection(
    lat: Double,
    lon: Double,
    raw: String,
    streets: String,
    wayIds: Array[Long],
    nodeId: String)
