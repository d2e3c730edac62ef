package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exprs.sketches

/** Bloom-filter semi-join reduction — the explicit form of the classic
  * 100 TB join optimization (Bloom CACM 1970; the mechanism behind Spark's
  * own InjectRuntimeFilter runtime bloom pushdown).
  *
  * Shape at scale: the filter is built over the SMALL side's keys with ONE
  * aggregate whose state is a constant-size bit array (128 KiB at the
  * default 2^20 bits) flowing through standard partial→final aggregation —
  * the exchange carries one filter per map task, never the keys. The merged
  * filter rides to every large-side task as a plan reference object (same
  * transport as a broadcast), and the probe expression is codegen'd into the
  * scan's WholeStageCodegen span, so non-matching large-side rows are
  * dropped AT THE SCAN, before the join exchange ever serializes them.
  * With a selective small side this typically removes the vast majority of
  * the large side's shuffle bytes for the price of one extra scan-local
  * boolean per row.
  *
  * Exactness: a Bloom filter has NO false negatives, so every surviving
  * large-side row set is a superset of the true join participants; the
  * subsequent exact equi-join removes false positives. The result is
  * row-identical to the plain join — which is exactly what the DuckDB
  * oracle (a plain join) checks.
  */
object JoinOps {

  /** `large ⋈ small` on largeKey = smallKey, with the large side pre-pruned
    * by a Bloom filter of the small side's keys. Row-identical to the plain
    * inner equi-join. */
  def bloomPrunedJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      bits: Int = 1 << 20, k: Int = 5): DataFrame = {
    // the one driver-side artifact is the merged filter itself — bounded at
    // bits/8 bytes by construction, independent of data volume
    val words = small
      .agg(sketches.bloom_agg(col(smallKey), bits, k).as("bf"))
      .head().getSeq[Long](0).toArray
    val pruned = large.filter(sketches.bloom_contains(col(largeKey), words, k))
    pruned.join(small, pruned(largeKey) === small(smallKey))
  }
}
