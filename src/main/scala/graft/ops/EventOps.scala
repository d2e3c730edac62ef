package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch analytics over the `events` table. The reference has no streaming
  * (SURVEY §2.10); these are the batch equivalents of the standard windowed
  * aggregations, with a Structured Streaming twin in graft.streaming.
  * All arithmetic is integer micros so a DuckDB oracle mirrors exactly.
  */
object EventOps {

  /** `value` summed as integer micro-units: double SUM is non-associative, so
    * Spark's partial aggregation and a serial oracle legitimately disagree at
    * scale (round-1 q_events_sessions hash mismatch). floor(value*1e6) is the
    * same double op in both engines; the BIGINT sum is order-insensitive. */
  private def sumMicro(value: org.apache.spark.sql.Column) =
    sum(floor(value * lit(1e6)).cast("long"))

  /** tumbling windows (integer bucket arithmetic, SQL-mirrorable). */
  def tumbling(events: DataFrame, windowSec: Long): DataFrame =
    events
      .withColumn("bucket", expr(s"unix_micros(cast(ts as timestamp)) DIV ${windowSec * 1000000L}"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), sumMicro(col("value")).as("sum_value_micro"))
      .select(col("event_type"), (col("bucket") * windowSec).as("window_start_sec"),
        col("n"), col("sum_value_micro"))

  /** gap-based sessionization per user: lag + cumulative flag sum, then
    * per-session aggregates. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    events
      .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        (floor((max(col("ts_us")) - min(col("ts_us"))) / lit(1000000L))).cast("long").as("duration_sec"),
        sumMicro(col("value")).as("sum_value_micro"))
  }
}
