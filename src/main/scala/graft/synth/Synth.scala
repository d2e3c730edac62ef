package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Deterministic synthetic spatial world, derived from the provided testdata
  * tables so a DuckDB oracle can recompute it with mirrored SQL (bit-identical
  * IEEE arithmetic; see graft.oracle.OracleSql). No external data, no RNG —
  * everything is integer arithmetic + exact double ops over `orders` keys.
  *
  * Layout (grid units: 1 row/col = 0.001°, microdeg = 1e-6°):
  *  - G horizontal streets H0..H{G-1} at lat = 37 + r*0.001
  *  - G vertical streets at lon = -122 + c*0.001, EXCEPT c=12 at -122+0.0113
  *    (so c=11/c=12 are 30 m apart). Names: c∈{2,5} → 'Main St' (duplicate
  *    intersections ≥50 m apart), c∈{11,12} → 'Twin' (<50 m, exercises the
  *    coalescing branches of geo.js:827-967), else 'V{c}'.
  *  - node(r,c) = r*1_000_000 + c, shared by H_r and V_c (topological joins)
  *  - a diagonal motorway (ref 'I 80;US 50', unnamed) crossing the grid with
  *    no shared nodes (geometric-only intersections, nodeId='Geom')
  *  - two unnamed motorway_link ways chained off the motorway (X1 fixpoint
  *    naming, geo.js:445-544)
  *  - an unnamed residential way over nodes (1,1)-(1,2) (JUNCTION fake-name
  *    path, geo.js:554-593)
  *  - image+caption rows (input_hint shape) whose lat/lon derive from phash
  */
object Synth {
  val LAT0 = 37.0
  val LON0 = -122.0
  val STEP = 0.001
  val TWIN_B_LON_OFF = 0.0113 // column 12 sits 0.0003 east of column 11

  val MOTORWAY_ID = 2000000L
  val LINK1_ID = 5000000L
  val LINK2_ID = 5000001L
  val CIRCLE_ID = 6000000L
  // the special-way node spaces sit FAR above any grid node id
  // (row·10⁶ + col < g·10⁶ + g ≈ 4.1·10⁹ at the clamp) — at 9·10⁸, the old
  // values, a grid with g > 900 rows would have COLLIDED its row-900+ node
  // ids with the motorway's, manufacturing spurious topological
  // intersections at scale factors ≥ ~0.2 (mirrored in OracleSql's nw CTEs)
  val MOTORWAY_NODE0 = 900000000000L
  val LINK_NODE0 = 910000000000L

  /** grid dimension: ceil(sqrt(count(orders))) clamped to [16, 4096].
    * The clamp is a guard against absurd inputs, NOT a density knob: it
    * must sit above ceil(sqrt(count)) for every scale factor actually run,
    * so the world keeps its ~1-image-per-cell, constant-way-density
    * invariant as sf grows (a binding clamp would silently densify the
    * geo world and make distance-join costs super-linear in sf — at the
    * old 512 cap, sf1.0's 1.5M orders would have hit it). */
  def gridSize(spark: SparkSession, sfDir: String): Int = {
    val cnt = orders(spark, sfDir).count()
    math.max(16, math.min(4096, math.ceil(math.sqrt(cnt.toDouble)).toLong)).toInt
  }

  /** deterministic GPS-trace random walk for one track key: LCG steps of
    * ±1e-3° max, start pinned by the key. The walk ACCUMULATES IN INTEGER
    * MICRODEGREES (exact, association-free), converting to double only at
    * emit — so a SQL oracle can rebuild every point with a windowed integer
    * cumulative sum and land on bit-identical doubles (a double-accumulated
    * walk would tie the result to summation order). Static entry for
    * StaticInvoke (codegen'd, no closure UDF). */
  def trackArray(key: Long, nPoints: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    var h = key & 0x7fffffffL
    def nxt(): Long = { h = (h * 48271 + 11) % 2147483647L; h }
    var latU = 37000000L + (key % 1000) * 100L // microdegrees
    var lonU = -122000000L + (key % 997) * 100L
    val rows = new Array[Any](nPoints)
    rows(0) = org.apache.spark.sql.catalyst.InternalRow(latU * 1e-6, lonU * 1e-6)
    var i = 1
    while (i < nPoints) {
      latU += (nxt() % 2001L) - 1000L
      lonU += (nxt() % 2001L) - 1000L
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(latU * 1e-6, lonU * 1e-6)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** (track_id, geometry) synthetic trajectories, one per order key. */
  def tracks(spark: SparkSession, sfDir: String, nPoints: Int = 40): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types._
    val geomType = ArrayType(StructType(Seq(
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", DoubleType, nullable = false))), containsNull = false)
    val key = col("o_orderkey")
    val geom = ColumnBridge.column(StaticInvoke(
      classOf[Synth.type], geomType, "trackArray",
      Seq(ColumnBridge.expression(key), Literal(nPoints)),
      propagateNull = true))
    // spread before the per-row walk synthesis (same single-partition-scan
    // hazard as images: 40-point track arrays are the heavy map work here);
    // project to the key FIRST — spreading the full orders row shipped all
    // nine TPC-H columns through the exchange to use one (guide §2.3,
    // measured as a 0.8-1.3 s single-task scan+write stage per consumer)
    graft.ops.Par.spread(
        orders(spark, sfDir).select(col("o_orderkey")), col("o_orderkey"))
      .select(key.as("track_id"), geom.as("geometry"))
  }

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** audio table (multimodal twin of `images`): deterministic 16-bit PCM
    * mono WAV payloads, one per order key. Real RIFF bytes (graft.synth.Wav),
    * sample stream seeded by the key — every field is reproducible from
    * o_orderkey alone, so aggregate features can be pinned as oracles. */
  def audio(spark: SparkSession, sfDir: String, withBytes: Boolean = true): DataFrame = {
    val o = graft.ops.Par.spread(
      orders(spark, sfDir).select(col("o_orderkey").as("k")), col("k"))
    val df = o.select(
      col("k"),
      concat(lit("aud"), col("k")).as("audio_id"),
      lit("wav").as("fmt"),
      when(col("k") % 3 === 0, 16000).otherwise(8000).as("sample_rate"),
      (lit(400) + (col("k") * 2654435761L % 800L)).cast("int").as("n_samples"))
    if (withBytes) {
      val wav = udf((k: Long, sr: Int, n: Int) => Wav.forSeed(k * 7919L + 17L, sr, n))
      df.withColumn("bytes", wav(col("k"), col("sample_rate"), col("n_samples")))
        .select("audio_id", "bytes", "fmt", "sample_rate", "n_samples")
    } else df.drop("k")
  }

  /** video table (multimodal container column): one clip per sampled order
    * (k % 199 == 0), n_frames concatenated REAL 24-bit BMP frames; frame f
    * carries the splitmix pixel pattern of phash = k·131071 + f, so a
    * first-principles SQL oracle can recompute every sampled frame's pixel
    * sums from o_orderkey alone (q_video_frames). Frame dims derive from k
    * (SQL-mirrorable): w = 8 + k%5, h = 9 + k%3. */
  def videos(spark: SparkSession, sfDir: String): DataFrame = {
    val o = graft.ops.Par.spread(
      orders(spark, sfDir).select(col("o_orderkey").as("k"))
        .filter(col("k") % 199 === 0), col("k"))
    val base = o.select(
      col("k"),
      concat(lit("vid"), col("k")).as("video_id"),
      lit("bmp").as("fmt"),
      (lit(8) + col("k") % 5).cast("int").as("w"),
      (lit(9) + col("k") % 3).cast("int").as("h"),
      (lit(6) + col("k") % 7).cast("int").as("n_frames"))
    val enc = udf((k: Long, w: Int, h: Int, n: Int) => {
      val out = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < n) {
        out.write(Bmp.encode(Bmp.pixels(k * 131071L + f, w, h), w, h))
        f += 1
      }
      out.toByteArray
    })
    base.withColumn("bytes", enc(col("k"), col("w"), col("h"), col("n_frames")))
      .select("video_id", "bytes", "fmt", "w", "h", "n_frames")
  }

  /** lon of grid column c (exact-double mirrored formula). */
  private def lonOf(c: Column): Column =
    when(c === 12, lit(LON0) + lit(TWIN_B_LON_OFF))
      .otherwise(lit(LON0) + c.cast("double") * lit(STEP))
  private def latOf(r: Column): Column = lit(LAT0) + r.cast("double") * lit(STEP)

  /** street name of vertical column c. */
  private def vName(c: Column): Column =
    when(c.isin(2, 5), lit("Main St"))
      .when(c.isin(11, 12), lit("Twin"))
      .otherwise(concat(lit("V"), c))

  /** ways table: (id, nodes, geometry array<struct<lat,lon>>, tags map). */
  def ways(spark: SparkSession, g: Int): DataFrame = {
    import spark.implicits._
    val idx = spark.range(g.toLong).select($"id".cast("long").as("i"))

    val hWays = idx.select(
      $"i".as("id"),
      transform(sequence(lit(0L), lit(g - 1L)), c => $"i" * 1000000L + c).as("nodes"),
      transform(sequence(lit(0L), lit(g - 1L)),
        c => struct(latOf($"i").as("lat"), lonOf(c).as("lon"))).as("geometry"),
      map(lit("highway"), lit("residential"), lit("name"), concat(lit("H"), $"i")).as("tags"))

    val vWays = idx.select(
      ($"i" + 1000000L).as("id"),
      transform(sequence(lit(0L), lit(g - 1L)), r => r * 1000000L + $"i").as("nodes"),
      transform(sequence(lit(0L), lit(g - 1L)),
        r => struct(latOf(r).as("lat"), lonOf($"i").as("lon"))).as("geometry"),
      map(lit("highway"),
        when($"i" % 10 === 7, lit("primary")).otherwise(lit("residential")),
        lit("name"), vName($"i")).as("tags"))

    val one = spark.range(1).select(lit(1L).as("one"))
    val motorway = one.select(
      lit(MOTORWAY_ID).as("id"),
      transform(sequence(lit(0L), lit(g - 1L)), k => lit(MOTORWAY_NODE0) + k).as("nodes"),
      transform(sequence(lit(0L), lit(g - 1L)), k => struct(
        (lit(LAT0) + k.cast("double") * lit(STEP) + lit(0.00025)).as("lat"),
        (lit(LON0) + k.cast("double") * lit(STEP) - lit(0.00025)).as("lon"))).as("geometry"),
      map(lit("highway"), lit("motorway"), lit("ref"), lit("I 80;US 50")).as("tags"))

    // two chained unnamed motorway_links: L1 touches motorway node k=1, L2 touches L1
    val link1 = one.select(
      lit(LINK1_ID).as("id"),
      array(lit(MOTORWAY_NODE0 + 1), lit(LINK_NODE0 + 1)).as("nodes"),
      array(struct(lit(37.00125).as("lat"), lit(-121.99925).as("lon")),
        struct(lit(37.0015).as("lat"), lit(-121.998).as("lon"))).as("geometry"),
      map(lit("highway"), lit("motorway_link")).as("tags"))
    val link2 = one.select(
      lit(LINK2_ID).as("id"),
      array(lit(LINK_NODE0 + 1), lit(LINK_NODE0 + 2)).as("nodes"),
      array(struct(lit(37.0015).as("lat"), lit(-121.998).as("lon")),
        struct(lit(37.002).as("lat"), lit(-121.9975).as("lon"))).as("geometry"),
      map(lit("highway"), lit("motorway_link")).as("tags"))

    // unnamed residential way over grid nodes (1,1)-(1,2): JUNCTION fake name
    val circle = one.select(
      lit(CIRCLE_ID).as("id"),
      array(lit(1000001L), lit(1000002L)).as("nodes"),
      array(struct(lit(LAT0 + STEP).as("lat"), (lit(LON0) + lit(1.0) * lit(STEP)).as("lon")),
        struct(lit(LAT0 + STEP).as("lat"), (lit(LON0) + lit(2.0) * lit(STEP)).as("lon"))).as("geometry"),
      map(lit("highway"), lit("residential")).as("tags"))

    hWays.unionByName(vWays).unionByName(motorway)
      .unionByName(link1).unionByName(link2).unionByName(circle)
  }

  /** image table in exact input_hint shape:
    * (image_id, bytes, w, h, fmt, caption, phash). Format mix: k%5==1 → png,
    * k%5==3 → jpeg (lossy: smooth-gradient pixels, quality 0.95, PSNR≥40dB),
    * else bmp — all three carry REAL encoded payloads (Bmp / javax.imageio). */
  def images(spark: SparkSession, sfDir: String, g: Int, withBytes: Boolean = true): DataFrame = {
    val s = (g - 1) * 1000L
    // bytes path only: spread the key scan BEFORE the per-row encode — a
    // small orders file plans as ONE partition and pins the whole
    // encode/decode map stage to one core (measured: q_image_psnr 5.0 s →
    // 0.8 s). The no-bytes projection is too cheap to pay a per-query
    // exchange for (measured: a flat +0.2-0.4 s on every light consumer);
    // heavy no-bytes consumers spread at their own operator entry instead.
    val o0 = orders(spark, sfDir).select(col("o_orderkey").as("k"))
    val o = if (withBytes) graft.ops.Par.spread(o0, col("k")) else o0
    val base = o.select(
      col("k"),
      ((col("k") * 48271L + 11L) % 2147483647L).as("h1"),
      ((col("k") * 69621L + 7L) % 2147483647L).as("h2"))
    val df = base.select(
      concat(lit("img"), col("k")).as("image_id"),
      (lit(8) + (col("h1") % 8)).cast("int").as("w"),
      (lit(8) + (col("h2") % 8)).cast("int").as("h"),
      when(col("k") % 5 === 1, "png").when(col("k") % 5 === 3, "jpeg")
        .otherwise("bmp").as("fmt"),
      concat(lit("caption "), col("k")).as("caption"),
      (col("h1") * 2147483648L + col("h2")).as("phash"))
    if (withBytes) {
      val enc = udf((fmt: String, phash: Long, w: Int, h: Int) =>
        Codec.encodeFor(fmt, phash, w, h))
      df.withColumn("bytes", enc(col("fmt"), col("phash"), col("w"), col("h")))
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    } else df
  }

  /** geotag derivation from phash (mirrored in oracle SQL):
    * adds u, v (microdeg offsets) and lat, lon columns. */
  def withGeotag(images: DataFrame, g: Int): DataFrame = {
    val s = (g - 1) * 1000L
    images
      .withColumn("h1", expr("phash DIV 2147483648")) // integral long division
      .withColumn("h2", col("phash") % lit(2147483648L))
      .withColumn("u0", col("h1") % s)
      .withColumn("v0", col("h2") % s)
      .withColumn("u", when(col("u0") % 500 === 0, col("u0") + 13).otherwise(col("u0")))
      .withColumn("v", when(col("v0") % 500 === 0, col("v0") + 13).otherwise(col("v0")))
      .withColumn("lat", lit(LAT0) + col("u").cast("double") * lit(1e-6))
      .withColumn("lon", lit(LON0) + col("v").cast("double") * lit(1e-6))
      .drop("h1", "h2", "u0", "v0")
  }

  /** city polygons: two rectangles + one concave L, edges at half-microdegree
    * offsets so no synthetic point ever sits on an edge. Returns prepared
    * (name, rings) pairs for PointInPolygonFirst. u=lat-offset, v=lon-offset
    * percentage points of the grid span s=(g-1)*1000 microdeg.
    */
  def cityPolys(g: Int): Array[(String, Array[Array[Double]])] = {
    val s = (g - 1) * 1000L
    def p(x: Int): Long = s * x / 100
    def lat(u: Long): Double = LAT0 + (u + 0.5) * 1e-6
    def lon(v: Long): Double = LON0 + (v + 0.5) * 1e-6
    def rect(uLo: Long, uHi: Long, vLo: Long, vHi: Long): Array[Double] =
      Array(lon(vLo), lat(uLo), lon(vHi), lat(uLo), lon(vHi), lat(uHi), lon(vLo), lat(uHi))
    val alpha = rect(p(10), p(35), p(10), p(40))
    val beta = rect(p(40), p(70), p(50), p(90))
    // L-shape: (u,v) vertices 70/5 -> 95/5 -> 95/20 -> 80/20 -> 80/45 -> 70/45
    val gamma = Array(
      lon(p(5)), lat(p(70)), lon(p(5)), lat(p(95)), lon(p(20)), lat(p(95)),
      lon(p(20)), lat(p(80)), lon(p(45)), lat(p(80)), lon(p(45)), lat(p(70)))
    Array(
      ("alpha", Array(alpha)),
      ("beta", Array(beta)),
      ("gamma", Array(gamma)))
  }

  /** cityPolys as an interior-disjoint RECTILINEAR decomposition for
    * ZoneOps.zonalLineLength: (zone, lat_lo, lat_hi, lon_lo, lon_hi), the
    * gamma L split into its two rectangles. Bounds are the SAME half-µ°
    * edges as cityPolys, computed with the identical double dag. */
  def cityRects(spark: SparkSession, g: Int): DataFrame = {
    import spark.implicits._
    val s = (g - 1) * 1000L
    def p(x: Int): Long = s * x / 100
    def lat(u: Long): Double = LAT0 + (u + 0.5) * 1e-6
    def lon(v: Long): Double = LON0 + (v + 0.5) * 1e-6
    Seq(
      ("alpha", lat(p(10)), lat(p(35)), lon(p(10)), lon(p(40))),
      ("beta", lat(p(40)), lat(p(70)), lon(p(50)), lon(p(90))),
      ("gamma", lat(p(70)), lat(p(95)), lon(p(5)), lon(p(20))),
      ("gamma", lat(p(70)), lat(p(80)), lon(p(20)), lon(p(45))))
      .toDF("zone", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
  }

  /** boundaries as a DataFrame (name, kind, rings array<array<double>>). */
  def boundariesDf(spark: SparkSession, g: Int): DataFrame = {
    import spark.implicits._
    val polys = cityPolys(g).map { case (n, r) => (n, "city", r.map(_.toSeq).toSeq) }.toSeq
    polys.toDF("name", "kind", "rings")
  }
}
