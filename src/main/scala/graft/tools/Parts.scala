package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the scan partition counts of every base input at the
  * bench scale factor (guide §6 — small files produce few tasks; a
  * CPU-heavy map stage inherits that parallelism). */
object Parts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"$name%-28s ${df.rdd.getNumPartitions}%4d partitions")
    p("documents", graft.synth.Synth.documents(spark, sfDir))
    p("orders", graft.synth.Synth.orders(spark, sfDir))
    p("embeddings", graft.synth.Synth.embeddings(spark, sfDir))
    p("events", graft.synth.Synth.events(spark, sfDir))
    p("lineitem", spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val (g, raw, wayData) = graft.Pipeline.prepared(spark, sfDir)
    p("ways(raw)", raw)
    p("wayData", wayData)
    p("images(noBytes)", graft.synth.Synth.images(spark, sfDir, g, withBytes = false))
    p("images(bytes)", graft.synth.Synth.images(spark, sfDir, g, withBytes = true))
    p("geoImages", graft.Pipeline.geoImages(spark, sfDir))
    p("tracks", graft.synth.Synth.tracks(spark, sfDir))
    p("audio", graft.synth.Synth.audio(spark, sfDir))
    p("videos", graft.synth.Synth.videos(spark, sfDir))
    spark.stop()
  }
}
