package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.exprs.sketches

/** HLL distinct sketch: accuracy vs exact, and the determinism property
  * that makes it pinnable (identical output under any partitioning). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL estimate within expected error of exact distinct (strings + longs)") {
    val n = 20000
    val df = spark.range(n).select(
      col("id"), concat(lit("key_"), (col("id") % 5000).cast("string")).as("s"))
    val Row = df.agg(
      sketches.hll_distinct(col("s"), 12).as("est_s"),
      sketches.hll_distinct(col("id") % 5000, 12).as("est_l")).head()
    val (estS, estL) = (Row.getLong(0), Row.getLong(1))
    // stderr ~1.04/sqrt(4096) = 1.6%; allow 5% (3 sigma)
    assert(math.abs(estS - 5000) <= 250, s"est_s=$estS")
    assert(math.abs(estL - 5000) <= 250, s"est_l=$estL")
  }

  test("HLL is partition-invariant: repartition(1) == repartition(32) exactly") {
    val df = spark.range(50000).select(
      concat(lit("v"), (col("id") % 12345).cast("string")).as("s"))
    val a = df.repartition(1).agg(sketches.hll_distinct(col("s"))).as[Long].head()
    val b = df.repartition(32).agg(sketches.hll_distinct(col("s"))).as[Long].head()
    val c = df.orderBy(col("s").desc).coalesce(3)
      .agg(sketches.hll_distinct(col("s"))).as[Long].head()
    assert(a === b && b === c, s"a=$a b=$b c=$c")
  }

  test("HLL small-range linear counting is exact-ish; nulls and empty groups") {
    val small = Seq("a", "b", "c", "a", null).toDF("s")
    val est = small.agg(sketches.hll_distinct(col("s"))).as[Long].head()
    assert(est === 3, s"est=$est") // linear counting at tiny cardinality
    val empty = small.filter(col("s") === "zzz")
      .agg(sketches.hll_distinct(col("s"))).as[Long].head()
    assert(est >= 0 && empty === 0)
  }

  test("graft_hll_distinct reachable from SQL, equals the fns builder result") {
    graft.plans.GraftPlans.enable(spark)
    spark.range(40000)
      .select(concat(lit("k"), (col("id") % 7777).cast("string")).as("s"))
      .createOrReplaceTempView("hll_sql_in")
    val viaSql = spark.sql(
      "SELECT graft_hll_distinct(s, 12) AS est FROM hll_sql_in").as[Long].head()
    val viaFns = spark.table("hll_sql_in")
      .agg(sketches.hll_distinct(col("s"), 12)).as[Long].head()
    assert(viaSql === viaFns, s"sql=$viaSql fns=$viaFns")
    assert(math.abs(viaSql - 7777) <= 400, s"est=$viaSql")
  }

  test("graft_topk_agg and graft_bloom_agg reachable from SQL, equal the builder results") {
    graft.plans.GraftPlans.enable(spark)
    spark.range(5000)
      .select((col("id") % 11).as("g"), (col("id") % 13).as("v"), col("id").as("tag"))
      .createOrReplaceTempView("topk_sql_in")
    val viaSql = spark.sql(
      """SELECT g, graft_topk_agg(v, tag, 4) AS top FROM topk_sql_in GROUP BY g""")
      .orderBy("g").collect().map(_.toString).toSeq
    val viaFns = spark.table("topk_sql_in")
      .groupBy("g").agg(graft.exprs.topk.topk_agg(col("v"), col("tag"), 4).as("top"))
      .orderBy("g").collect().map(_.toString).toSeq
    assert(viaSql === viaFns)
    val bSql = spark.sql(
      "SELECT graft_bloom_agg(tag, 65536, 5) AS bf FROM topk_sql_in").head().getSeq[Long](0)
    val bFns = spark.table("topk_sql_in")
      .agg(sketches.bloom_agg(col("tag"), 65536, 5)).head().getSeq[Long](0)
    assert(bSql === bFns)
  }

  test("HLL grouped: per-group sketches independent, disjoint union ≈ sum") {
    val df = spark.range(30000).select(
      (col("id") % 3).cast("string").as("g"),
      // per-group value spaces: id/3 is a fresh 0..9999 counter within each
      // residue class, so group g has exactly (g+1)*1000 distinct values
      concat(col("id") % 3, lit(":"),
        (floor(col("id") / 3).cast("long") % ((col("id") % 3 + 1) * 1000))
          .cast("string")).as("s"))
    val m = df.groupBy("g").agg(sketches.hll_distinct(col("s")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(m("0") - 1000) <= 80, s"g0=${m("0")}")
    assert(math.abs(m("1") - 2000) <= 150, s"g1=${m("1")}")
    assert(math.abs(m("2") - 3000) <= 200, s"g2=${m("2")}")
  }

  // ---- Count-Min sketch + exact heavy hitters ----

  /** skewed corpus: token t_i appears (i+1)*step times — known exact counts. */
  private def skewedTokens(nTok: Int, step: Int) = {
    val rows = for {
      i <- 0 until nTok
      _ <- 0 until (i + 1) * step
    } yield s"t$i"
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Tuple1(_)), 16)
    ).toDF("tok")
  }

  test("CMS never undercounts, even with a tiny colliding sketch (w=16, d=2)") {
    val df = skewedTokens(nTok = 200, step = 3) // 200 tokens >> 16 slots
    val sketch = df.agg(sketches.cms_sketch(col("tok"), 2, 16))
      .head().getSeq[Long](0).toArray
    val est = df.distinct()
      .select(col("tok"), sketches.cms_min_count(col("tok"), sketch, 2, 16).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (i <- 0 until 200) {
      val truth = (i + 1) * 3L
      assert(est(s"t$i") >= truth, s"t$i: est=${est(s"t$i")} < true=$truth")
    }
  }

  test("CMS is partition-invariant: repartition(1) == repartition(32) exactly") {
    val df = skewedTokens(nTok = 100, step = 2)
    val a = df.repartition(1).agg(sketches.cms_sketch(col("tok"), 4, 64))
      .head().getSeq[Long](0)
    val b = df.repartition(32).agg(sketches.cms_sketch(col("tok"), 4, 64))
      .head().getSeq[Long](0)
    assert(a == b)
  }

  test("heavyHitters is EXACT under heavy collision pressure (w=16)") {
    // 300 distinct tokens forced into 16 slots: nearly every slot is a
    // multi-token pileup, so the candidate filter admits plenty of false
    // positives — the exact re-count must kill all of them.
    val docs = skewedTokens(nTok = 300, step = 1)
      .groupBy(spark_partition_id().as("p")).agg(
        concat_ws(" ", collect_list(col("tok"))).as("text"))
      .select(col("text"))
    val minCount = 150L
    val got = graft.text.TextOps.heavyHitters(docs, minCount, d = 2, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (0 until 300).map(i => s"t$i" -> (i + 1).toLong)
      .filter(_._2 >= minCount).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
  }

  test("cms_sketch rejects unhashable input types at analysis time") {
    val df = spark.range(4).select(col("id").cast("double").as("d"))
    val e = intercept[Exception](
      df.agg(sketches.cms_sketch(col("d"))).collect())
    assert(e.getMessage.toLowerCase.contains("cms_sketch"))
  }

  test("bloom: no false negatives, bounded false-positive rate, partition-invariant") {
    val keys = spark.range(10000).select((col("id") * 7 + 3).as("k"))
    def build(parts: Int): Array[Long] =
      keys.repartition(parts)
        .agg(sketches.bloom_agg(col("k"), bits = 1 << 17, k = 5))
        .head().getSeq[Long](0).toArray
    val w1 = build(1)
    val w32 = build(32)
    assert(w1.toSeq == w32.toSeq, "filter must be identical under any partitioning")
    // every inserted key is found
    val missed = keys.filter(!sketches.bloom_contains(col("k"), w1, 5)).count()
    assert(missed == 0L, s"$missed false negatives")
    // probes from a disjoint key space mostly miss (m/n ≈ 13 bits/key,
    // k = 5 → theoretical fp ≈ 1.4%; allow 5%)
    val probes = spark.range(10000).select((col("id") * 7 + 4).as("k"))
    val fp = probes.filter(sketches.bloom_contains(col("k"), w1, 5)).count()
    assert(fp < 500, s"false-positive count $fp out of 10000")
  }

  test("bloom: string keys hash identically on insert and probe") {
    val df = spark.range(2000).select(concat(lit("doc_"), col("id")).as("s"))
    val w = df.agg(sketches.bloom_agg(col("s"), bits = 1 << 15, k = 5))
      .head().getSeq[Long](0).toArray
    assert(df.filter(!sketches.bloom_contains(col("s"), w, 5)).count() == 0L)
  }

  test("topk_agg equals the window row_number form on random data, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    import graft.exprs.topk
    // values with heavy ties (v = id % 17) force the tag tie-break
    val df = spark.range(20000).select(
      (col("id") % 23).as("g"), (col("id") % 17).as("v"), col("id").as("tag"))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("tag"))
    val expected = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("g", "rk", "tag", "v")
      .as[(Long, Int, Long, Long)].collect().toSet
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts)
        .groupBy("g").agg(topk.topk_agg(col("v"), col("tag"), 5).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rk"), col("col.tag"), col("col.v"))
        .as[(Long, Int, Long, Long)].collect().toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("TopKBuf: insert/merge keep the exact sorted top-k under adversarial orders") {
    import graft.exprs.TopKBuf
    val rng = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val k = 1 + rng.nextInt(6)
      val n = rng.nextInt(40)
      val entries = Seq.fill(n)((rng.nextInt(10).toLong, rng.nextLong())).distinct
      val expected = entries.sortBy { case (v, t) => (-v, t) }.take(k)
      // single buffer, random insertion order
      val b1 = new TopKBuf(k)
      rng.shuffle(entries).foreach { case (v, t) => b1.insert(v, t) }
      assert((0 until b1.size).map(i => (b1.values(i), b1.tags(i))) === expected)
      // split into random chunks, merge (serialize round-trip included)
      val chunks = rng.shuffle(entries).grouped(math.max(1, 1 + rng.nextInt(5))).toSeq
      val merged = chunks.map { ch =>
        val b = new TopKBuf(k)
        ch.foreach { case (v, t) => b.insert(v, t) }
        TopKBuf.fromBytes(k, b.toBytes)
      }.reduceOption { (a, b) => a.mergeIn(b); a }.getOrElse(new TopKBuf(k))
      assert((0 until merged.size).map(i => (merged.values(i), merged.tags(i))) === expected)
    }
  }

  test("bloomPrunedJoin is row-identical to the plain join") {
    val large = spark.range(50000).select(
      (col("id") % 4096).as("k"), col("id").as("payload"))
    val small = spark.range(300).select(
      (col("id") * 13 % 4096).as("sk"), col("id").as("tag"))
    val pruned = graft.ops.JoinOps.bloomPrunedJoin(large, small, "k", "sk")
      .select("k", "payload", "sk", "tag")
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "payload", "sk", "tag")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "bloom-pruned join diverged from the plain join")
  }
}
