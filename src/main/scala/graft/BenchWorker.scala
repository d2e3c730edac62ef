package graft

import org.apache.spark.sql.SparkSession

/** Child process for the scaling measurement: one JVM per parallelism level,
  * launched under `taskset` with -XX:ActiveProcessorCount so the ENTIRE
  * process (task slots, GC, shuffle IO) is capped at N CPUs — local[N]
  * alone caps only task slots, letting GC borrow the host's idle cores and
  * corrupting thread-scaling numbers. Registers the pre-written cell-bucketed
  * tables in its own catalog (the co-partitioned layout makes the measured
  * join exchange-free).
  *
  * Runs as a PERSISTENT server: the parent sends "RUN" on stdin for each
  * measured attempt and reads "RESULT <rows> <sec> <stealFrac>" on stdout.
  * Persistence lets the parent INTERLEAVE attempts of the low- and high-
  * parallelism legs in time, so the min-filtered best of each leg samples
  * the same shared-host load distribution — a leg measured entirely inside
  * a co-tenant steal storm would otherwise corrupt the efficiency ratio in
  * either direction. It also amortizes JIT warmup across many attempts.
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val Array(imagesBPath, segsBPath, gS, nS, shufS) = args
    val n = nS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      // shuffle through tmpfs: the measurement isolates CPU scaling; a
      // single sandbox disk would otherwise put a thread-invariant IO floor
      // under every run (real clusters stripe shuffle across many disks)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.shuffle.partitions", shufS)
      // the bucketed plan has no exchanges for AQE to re-plan; AQE's
      // per-stage materialization only adds fixed driver overhead, which is
      // exactly what caps small-N→4N efficiency (Amdahl on the serial part)
      .config("spark.sql.adaptive.enabled", "false")
      // never broadcast the segment side: the broadcast build is
      // driver-serial (~10 s at 1.8M rows) and impossible at planet scale
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir", "/dev/shm/graft-spark-wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.registerBucketed(spark, imagesBPath, segsBPath)

    // hypervisor steal on the pinned CPUs, from /proc/stat deltas: the
    // sandbox host shows multi-second steal storms from co-tenant VMs that
    // taskset cannot shield. The parent uses the per-run steal fraction to
    // decide when it has clean samples.
    def stealTotal(): (Long, Long) = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        var steal = 0L; var total = 0L
        src.getLines().foreach { line =>
          if (line.startsWith("cpu") && !line.startsWith("cpu ")) {
            val name = line.takeWhile(!_.isWhitespace)
            val id = name.drop(3).toInt
            if (id < n) {
              val f = line.split("\\s+").drop(1).map(_.toLong)
              total += f.sum
              if (f.length > 7) steal += f(7)
            }
          }
        }
        (steal, total)
      } finally src.close()
    }

    println("READY")
    Console.flush()
    val in = scala.io.Source.stdin.getLines()
    var done = false
    while (!done && in.hasNext) {
      in.next().trim match {
        case "RUN" =>
          val (s0, t0) = stealTotal()
          val (rows, sec) = Bench.headline(spark, gS.toInt)
          val (s1, t1) = stealTotal()
          val frac = if (t1 > t0) (s1 - s0).toDouble / (t1 - t0) else 0.0
          println(s"RESULT $rows $sec $frac")
          Console.flush()
        case "EXIT" => done = true
        case _      => ()
      }
    }
    spark.stop()
  }
}
