package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.ckpt.Lineage

class StreamCkptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming tumbling counts match batch EventOps on the events table") {
    implicit val sqlCtx = spark.sqlContext
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      .limit(2000).cache()
    val rows = batch.as[(java.sql.Timestamp, String, Double)].collect()

    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val sdf = Streaming.tumblingCounts(
      mem.toDF().toDF("ts", "event_type", "value"), 300)
    val q = sdf.writeStream.format("memory").queryName("tumbles")
      .outputMode("complete").start()
    mem.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbles")
      .select("event_type", "window_start_sec", "n")
      .as[(String, Long, Long)].collect().toSet
    val expected = graft.ops.EventOps.tumbling(batch, 300)
      .select("event_type", "window_start_sec", "n")
      .as[(String, Long, Long)].collect().toSet
    assert(streamed === expected)
  }

  test("streaming sessionization closes sessions on gap (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.Ev]
    val out = Streaming.sessionize(spark, mem.toDS(), gapSec = 60)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    val m = 1000000L
    mem.addData(
      Streaming.Ev(1, 0 * m, 1.0), Streaming.Ev(1, 30 * m, 2.0),
      Streaming.Ev(1, 200 * m, 3.0), // gap > 60 s: closes session 1
      Streaming.Ev(2, 10 * m, 5.0))
    q.processAllAvailable()
    mem.addData(Streaming.Ev(1, 500 * m, 4.0)) // closes session 2
    q.processAllAvailable()
    q.stop()
    val sess = spark.table("sessions")
      .as[Streaming.SessOut].collect().map(s => (s.user_id, s.sess_id) -> s).toMap
    assert(sess((1L, 1L)).n_events === 2 && sess((1L, 1L)).duration_sec === 30)
    assert(sess((1L, 1L)).sum_value === 3.0)
    assert(sess((1L, 2L)).n_events === 1 && sess((1L, 2L)).sum_value === 3.0)
  }

  test("lineage checkpoint: stage skipped on resume, recomputed on input change") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val input1 = spark.range(100).toDF("id")
    def stage(df: org.apache.spark.sql.DataFrame) = {
      counter.incrementAndGet()
      df.withColumn("sq", col("id") * col("id"))
    }
    val out1 = Lineage.materialize(spark, dir, input1, stage)
    assert(out1.count() === 100 && counter.get() === 1)
    // resume: same input -> stage NOT re-run
    val out2 = Lineage.materialize(spark, dir, input1, stage)
    assert(out2.count() === 100 && counter.get() === 1)
    assert(out2.agg(sum(col("sq"))).as[Long].head() === (0L until 100L).map(i => i * i).sum)
    // changed input -> recompute
    val out3 = Lineage.materialize(spark, dir, spark.range(50).toDF("id"), stage)
    assert(out3.count() === 50 && counter.get() === 2)
    // manifest carries per-partition lineage
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_lineage_manifest.json"))
    assert(manifest.contains("\"partitions\"") && manifest.contains("\"rows\""))
  }
}
