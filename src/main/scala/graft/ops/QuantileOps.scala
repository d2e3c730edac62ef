package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT order statistics (quantiles) without a global sort — the
  * histogram-narrowing construction (the classic distributed selection
  * algorithm; same family as Blum et al. selection, adapted to scans):
  *
  *   level 0: one scan → (min, max, count); one scan → equi-width
  *            histogram of `buckets` counters (a groupBy on ≤ `buckets`
  *            keys: map-side partial aggregation makes the exchange carry
  *            at most `buckets` rows per task, never the data).
  *   level k: the bucket containing the target rank is re-scanned and
  *            re-histogrammed on ITS OWN min/max; each level divides the
  *            candidate population by ~`buckets` until it fits
  *            `collectLimit`, where the survivors (≤ 64k doubles, a
  *            bounded driver artifact) are sorted locally and indexed.
  *
  * A global distributed sort of 100 TB shuffles 100 TB; this resolves an
  * exact quantile in ~log_buckets(n) filtered scans (n = 1e13, buckets =
  * 8192 → 3 levels) with only counter-sized exchanges. Filters are pushed
  * to the scan, and every level's predicate is a conjunction of range
  * tests on the value column — parquet min/max page pruning applies.
  *
  * Determinism: the k-th smallest VALUE of a multiset is unique regardless
  * of tie order, and every step here (counting, range filtering, local
  * sort) is order-insensitive — so the result is exact and identical under
  * any partitioning, which makes it SQL-oracle-able (DuckDB: row_number
  * over ORDER BY v, pick rank k).
  *
  * Convergence guards: an all-equal population short-circuits (lo == hi);
  * if a level stops making progress (duplicate pileups finer than the
  * bucket width, or width underflow near subnormals), the level falls back
  * to exact per-distinct-value counts, which always resolves.
  */
object QuantileOps {

  /** (q, value) for each requested quantile of `df.valueCol` (nulls
    * ignored), where value is the exact floor(q*(n-1))-th smallest
    * (0-indexed discrete quantile, no interpolation). */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                     buckets: Int = 8192,
                     collectLimit: Int = 1 << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"exactQuantiles: quantiles must be in [0,1], got $qs")
    val spark = df.sparkSession
    val work = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val st = work.agg(min("v"), max("v"), count("v")).head()
    val n = st.getLong(2)
    require(n > 0, s"exactQuantiles: no non-null values in $valueCol")
    val (lo, hi) = (st.getDouble(0), st.getDouble(1))
    // The level-0 narrowing state (population, bounds, bucket width) is
    // identical for EVERY requested quantile, so the level-0 full-data
    // histogram is computed ONCE and each quantile resolves its own target
    // bucket from it — q quantiles cost 1 full histogram pass + q bounded
    // bucket chains instead of q full passes (at 100 TB the full passes ARE
    // the cost). The k-th smallest value is search-path-independent, so
    // results are bit-identical to the per-quantile loop.
    val rows: Seq[Row] =
      if (lo == hi) qs.sorted.map(q => Row(q, lo))
      else if (n <= collectLimit) {
        val arr = work.collect().map(_.getDouble(0))
        java.util.Arrays.sort(arr)
        qs.sorted.map { q =>
          Row(q, arr(math.floor(q * (n - 1).toDouble).toInt))
        }
      } else {
        val width = (hi - lo) / buckets
        val bExpr = least(lit(buckets - 1),
          floor((col("v") - lit(lo)) / lit(width)).cast("int"))
        val hist = work.groupBy(bExpr.as("b")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        qs.sorted.map { q =>
          val k = math.floor(q * (n - 1).toDouble).toLong
          var cum = 0L; var target = Int.MinValue; var localK = 0L; var cnt = 0L
          for ((b, c) <- hist if target == Int.MinValue) {
            if (cum + c > k) { target = b; localK = k - cum; cnt = c }
            cum += c
          }
          assert(target != Int.MinValue, s"rank $k not covered by histogram (n=$n)")
          val v =
            if (cnt == n) // no level-0 progress: original loop's dv fallback
              orderStat(work, k, n, lo, hi, buckets, collectLimit)
            else {
              val sub = work.filter(bExpr === target)
              val bs = sub.agg(min("v"), max("v")).head()
              orderStat(sub, localK, cnt, bs.getDouble(0), bs.getDouble(1),
                buckets, collectLimit)
            }
          Row(q, v)
        }
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("q", DoubleType, nullable = false),
                     StructField("value", DoubleType, nullable = false))))
  }

  /** exact k-th smallest (0-indexed) of `work.v`, which holds n rows all
    * within [lo, hi]. Iterative narrowing; each pass either terminates or
    * strictly shrinks the candidate population. */
  private def orderStat(work0: DataFrame, k0: Long, n0: Long,
                        lo0: Double, hi0: Double,
                        buckets: Int, collectLimit: Int): Double = {
    var work = work0; var k = k0; var n = n0; var lo = lo0; var hi = hi0
    while (true) {
      if (lo == hi) return lo // all remaining values equal
      if (n <= collectLimit) { // bounded driver artifact: ≤ 64k doubles
        val arr = work.collect().map(_.getDouble(0))
        java.util.Arrays.sort(arr)
        return arr(k.toInt)
      }
      val width = (hi - lo) / buckets
      val bCol = least(lit(buckets - 1),
        floor((col("v") - lit(lo)) / lit(width)).cast("int")).as("b")
      val hist = work.groupBy(bCol).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var cum = 0L; var target = -1; var localK = 0L; var cnt = 0L
      for ((b, c) <- hist if target < 0) {
        if (cum + c > k) { target = b; localK = k - cum; cnt = c }
        cum += c
      }
      assert(target >= 0, s"rank $k not covered by histogram (n=$n)")
      if (cnt == n) {
        // no progress: duplicates piled finer than the bucket width (or
        // width underflow) — resolve by exact distinct-value counts, which
        // at this point are few by construction
        val dv = work.groupBy("v").count()
          .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
        var c2 = 0L
        for ((v, c) <- dv) { if (c2 + c > k) return v; c2 += c }
        throw new IllegalStateException(s"rank $k beyond population $c2")
      }
      work = work.filter(least(lit(buckets - 1),
        floor((col("v") - lit(lo)) / lit(width)).cast("int")) === target)
      val st = work.agg(min("v"), max("v")).head()
      k = localK; n = cnt; lo = st.getDouble(0); hi = st.getDouble(1)
    }
    throw new IllegalStateException("unreachable")
  }
}
