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
}
