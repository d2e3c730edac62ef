package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan-parallelism floor (guide §6 / §2.2).
  *
  * Small input files produce few scan tasks (128 MB splits), and every
  * CPU-heavy MAP stage planned on top of such a scan — image/audio decode,
  * shingling, minhash signatures, trajectory synthesis — inherits that
  * parallelism until the first exchange: measured at sf0.1, every parquet
  * base table planned as ONE partition, so decode stages ran 1-of-32 cores.
  *
  * `spread` raises the partition count to the session's default parallelism
  * ONLY when the input is undersized; at real scale (inputs already split
  * into >= cores partitions) it is a provable no-op — no shuffle is ever
  * added to a big scan. The spread is a deterministic hash repartition on a
  * caller-supplied key, so row placement is reproducible run-to-run (the
  * round-robin form would depend on scan order and pay a local sort,
  * guide §2.5).
  *
  * Results are unaffected by construction: every operator in this repo is
  * partitioning-insensitive (integer/struct-min aggregates, windows with
  * total orders — the property the oracle gate enforces at three SFs).
  */
object Par {
  def spread(df: DataFrame, key: Column): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want, key) else df
  }
}
