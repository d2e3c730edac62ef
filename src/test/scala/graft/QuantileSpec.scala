package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.QuantileOps

/** Histogram-narrowing exact quantiles vs brute-force sorted-array truth,
  * with collectLimit forced tiny so the multi-level narrowing path (not
  * the collect shortcut) is what's under test. */
class QuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val QS = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def truth(vals: Array[Double], q: Double): Double = {
    val s = vals.sorted
    s(math.floor(q * (s.length - 1).toDouble).toInt)
  }

  private def check(vals: Array[Double], collectLimit: Int, buckets: Int = 32): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.toSeq.map(Tuple1(_)), 16)).toDF("x")
    val got = QuantileOps.exactQuantiles(df, "x", QS, buckets, collectLimit)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (q <- QS)
      assert(got(q) == truth(vals, q), s"q=$q got=${got(q)} want=${truth(vals, q)}")
  }

  test("multi-level narrowing matches sorted-array truth (deterministic LCG values)") {
    // 40k values, collectLimit 256 → must narrow at least two levels
    val vals = Array.iterate(123456789L, 40000)(x => (x * 48271) % 2147483647L)
      .map(x => (x % 1000000L).toDouble / 7.0)
    check(vals, collectLimit = 256)
  }

  test("duplicate pileups: 90% of mass on 3 values forces the no-progress fallback") {
    val vals = Array.tabulate(30000) { i =>
      if (i % 10 == 0) i.toDouble else (i % 3).toDouble * 1e-9
    }
    check(vals, collectLimit = 64, buckets = 16)
  }

  test("all-equal population short-circuits") {
    val vals = Array.fill(5000)(42.5)
    check(vals, collectLimit = 100)
  }

  test("small population takes the collect shortcut and stays exact") {
    val vals = Array.tabulate(500)(i => (499 - i).toDouble)
    check(vals, collectLimit = 1 << 16)
  }

  test("negative and mixed-sign ranges") {
    val vals = Array.tabulate(20000)(i => (i - 10000).toDouble * 0.37)
    check(vals, collectLimit = 128)
  }

  test("empty input is a clear error, not NaN") {
    val df = spark.range(0).select(col("id").cast("double").as("x"))
    val e = intercept[IllegalArgumentException](
      QuantileOps.exactQuantiles(df, "x", Seq(0.5)).collect())
    assert(e.getMessage.contains("no non-null values"))
  }
}
