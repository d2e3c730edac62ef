package graft

import org.apache.spark.sql.SparkSession

/** Child process for the scaling measurement: one JVM per parallelism level,
  * launched under `taskset` with -XX:ActiveProcessorCount so the ENTIRE
  * process (task slots, GC, shuffle IO) is capped at N CPUs — local[N]
  * alone caps only task slots, letting GC borrow the host's idle cores and
  * corrupting thread-scaling numbers. Prints "RESULT <rows> <minSeconds>".
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val Array(imagesPath, waysPath, gS, nS, repeatsS, shufS) = args
    val n = nS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      // shuffle through tmpfs: the measurement isolates CPU scaling; a
      // single sandbox disk would otherwise put a thread-invariant IO floor
      // under every run (real clusters stripe shuffle across many disks)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", shufS)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = (1 to repeatsS.toInt).map { _ =>
      Bench.headline(spark, imagesPath, waysPath, gS.toInt)

    }
    val best = runs.minBy(_._2)
    println(s"RESULT ${best._1} ${best._2}")
    spark.stop()
  }
}
