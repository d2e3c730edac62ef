package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase profiler (guide §1: measure first, noop sink §1.4).
  * Not part of the bench contract; run as
  *   sbt "runMain graft.tools.Prof <queryName> [repeat]"
  * to time a declared query end-to-end N times in one session, or hack the
  * per-phase blocks below for a specific query's internals.
  */
object Prof {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    System.err.println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job-level wall-clock breakdown: jobId, duration, #stages/#tasks
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, (System.nanoTime(), js.stageInfos.size,
          js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, nst, ntk) = jobStart.getOrDefault(je.jobId, (0L, 0, 0))
        System.err.println(f"[prof-job] job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  stages=$nst%-3d tasks=$ntk")
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3).getOrElse(-1.0)
        System.err.println(f"[prof-stage] stage ${si.stageId}%4d wall=$wall%7.3f s run=${si.taskMetrics.executorRunTime / 1e3}%8.3f s cpu=${si.taskMetrics.executorCpuTime / 1e9}%8.3f s tasks=${si.numTasks}%-4d ${si.name.take(60)}")
      }
    })

    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_doc_minhash_eval"))
    val repeat = if (args.length > 1) args(1).toInt else 2

    // warm the shared memoized inputs out of the measured loop (same as Bench)
    time("prep") {
      val (_, _, wayData) = graft.Pipeline.prepared(spark, sfDir)
      wayData.count()
      val feats = graft.Pipeline.features(spark, sfDir)
      feats.count()
    }
    for (name <- names; i <- 0 until repeat) {
      val fn = graft.SparkEntry.queries(name)
      time(s"$name#$i") { fn(spark, sfDir).count() }
    }
    spark.stop()
  }
}
