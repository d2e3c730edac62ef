package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. */
object SampleOps {

  /** EXACT per-stratum quota sampling — the deterministic replacement for
    * `df.sampleBy` (which is probabilistic: quotas only hold in
    * expectation, and the sample changes run to run). Every stratum keeps
    * its `quota` records with the smallest scrambled keys (all records if
    * the stratum is smaller), so the sample is a pure function of the data:
    * identical on every run, engine, partitioning, and cluster size — the
    * property a training-data freeze actually needs.
    *
    * The scramble (id·2654435761 + 12345 mod 2^31, Knuth's multiplicative
    * hash; the multiplier is odd so the map is injective mod 2^31 — no
    * ties for ids < 2^31) decorrelates the keep set from ingest order.
    * The id is pre-reduced mod 2^31 BEFORE the multiply — algebraically a
    * no-op (m·(id mod 2^31) ≡ m·id mod 2^31), but it bounds the i64
    * product below 2^31·m < 2^63 for EVERY id, so the scramble never
    * silently wraps at scale (and the DuckDB oracle spells the identical
    * pre-reduction, so the engines agree at any id).
    *
    * Scale shape: selection runs through the native k-bounded TopKAgg, so
    * map-side combine discards non-contenders BEFORE the exchange — the
    * shuffle carries ≤ quota·strata rows per map task, never the corpus.
    * The window form (`row_number() OVER (PARTITION BY stratum ORDER BY
    * skey) <= quota`) shuffles and sorts EVERY row; at 10^12 rows that is
    * the whole table through one exchange. Wide payloads join back by id
    * after the cut.
    *
    * Output: one row per kept record — (strata..., skey, id), ordered
    * within stratum by skey (the TopKAgg state is ordered by
    * construction). */
  def stratifiedQuota(df: DataFrame, strata: Seq[String], idCol: Column,
                      quota: Int): DataFrame = {
    require(strata.nonEmpty, "stratifiedQuota: at least one stratum column")
    val skey = pmod(pmod(idCol, lit(2147483648L)) * lit(2654435761L) + lit(12345L),
      lit(2147483648L))
    df.select(strata.map(col) :+ skey.as("skey") :+ idCol.as("id"): _*)
      .groupBy(strata.map(col): _*)
      // TopKAgg ranks (value DESC, tag ASC); negate for smallest-first
      .agg(graft.exprs.topk.topk_agg(-col("skey"), col("id"), quota).as("top"))
      .select(strata.map(col) :+ explode(col("top")).as("e"): _*)
      .select(strata.map(col) :+ (-col("e.v")).as("skey") :+
        col("e.tag").as("id"): _*)
  }
}
