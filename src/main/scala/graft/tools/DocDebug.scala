package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: size/time breakdown of the PPJoin truth pipeline used by the
  * three q_doc_*_eval queries. Mirrors TextOps internals read-only. */
object DocDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dbg] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs0 = graft.synth.Synth.documents(spark, sfDir).select("doc_id", "text")
    // mutatedTwins replica (SparkEntry:61): salted suffix twins
    val twins = docs0.filter(col("doc_id") % 29 === 0)
      .withColumn("n", size(split(col("text"), " ")))
      .withColumn("m", expr("CAST(((doc_id % 3 + 1) * n) DIV 2 AS INT)"))
      .withColumn("text",
        when(col("m") >= 1, concat(col("text"), lit(" "),
          array_join(transform(sequence(lit(1), col("m")),
            j => concat(lit("q"), col("doc_id").cast("string"), lit("x"),
              j.cast("string"))), " ")))
        .otherwise(col("text")))
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val docs = docs0.unionByName(twins)
    val t = 0.5
    val d = graft.ops.Par.spread(docs, col("doc_id"))
      .select(lit("all").as("lang"), lit("all").as("source"),
        col("doc_id"), array_distinct(graft.text.TextOps.shingles(col("text"))).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .localCheckpoint(true)
    time("shingle sets")(d.count())
    println("[dbg] avg nsh: " + d.agg(avg("nsh")).head())
    val inv = d.select(col("lang"), col("source"), col("doc_id"), col("nsh"),
      explode(col("sh")).as("shingle"))
    time("postings")(println("[dbg] postings: " + inv.count()))
    val dfreq = inv.groupBy(col("lang"), col("source"), col("shingle"))
      .agg(count(lit(1)).as("df"))
    time("dfreq")(println("[dbg] distinct shingles: " + dfreq.count()))
    val w = Window.partitionBy(col("lang"), col("source"), col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    val prefix = inv.join(dfreq, Seq("lang", "source", "shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("nsh") - ceil(col("nsh") * lit(t)) + lit(1))
      .select(col("lang"), col("source"), col("shingle"), col("doc_id"))
      .localCheckpoint(true)
    time("prefix ckpt")(println("[dbg] prefix postings: " + prefix.count()))
    val l = prefix.select(col("lang"), col("source"), col("shingle"), col("doc_id").as("id1"))
    val r = prefix.select(col("lang"), col("source"), col("shingle"), col("doc_id").as("id2"))
    val rawPairs = l.join(r, Seq("lang", "source", "shingle")).filter(col("id1") < col("id2"))
    time("raw self-join pairs")(println("[dbg] raw pairs: " + rawPairs.count()))
    val cand = rawPairs.select("lang", "source", "id1", "id2").dropDuplicates()
      .localCheckpoint(true)
    time("cand dedup")(println("[dbg] cand pairs: " + cand.count()))
    val s1 = d.select(col("lang"), col("source"), col("doc_id").as("id1"),
      col("sh").as("sh1"), col("nsh").as("n1"))
    val s2 = d.select(col("lang"), col("source"), col("doc_id").as("id2"),
      col("sh").as("sh2"), col("nsh").as("n2"))
    val verified = cand
      .join(s1, Seq("lang", "source", "id1"))
      .join(s2, Seq("lang", "source", "id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter").cast("double") / col("uni").cast("double") >= t)
    time("verify")(println("[dbg] truth pairs: " + verified.count()))
    spark.stop()
  }
}
