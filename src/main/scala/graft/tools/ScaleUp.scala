package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×K scale-up of a driver testdata directory, for the
  * scale-evidence runs (VERDICT r4 top ask: walls at sf1.0 vs sf0.1).
  *
  * Every table is replicated K times with its key space shifted per replica
  * (new_key = key + r·|keyspace|), so the scaled world is EXACTLY the driver
  * world's shape at K× the rows: per-key series lengths, group
  * cardinality-per-key, dimension tables, and value distributions are all
  * preserved, and the engine's own world synthesis (gridSize =
  * ceil(sqrt(count(orders)))) grows the geo grid to keep the
  * ~1-image-per-cell density invariant.
  *
  * Two tables need more than a key shift to avoid manufacturing a workload
  * the driver corpus doesn't have:
  *  - documents: replica r > 0 rewrites each word through a ROTATION of the
  *    (31-word) vocabulary. A rotation is a bijection, so each replica's
  *    shingle/df/near-dup structure is isomorphic to the original (same df
  *    multiset, same planted-dup pairs), while shingles never collide
  *    ACROSS replicas — plain replication would have given every doc 10
  *    exact copies and blown candidate generation up 100× in the dup
  *    neighborhoods, a different (and unrealistically adversarial) corpus.
  *  - embeddings: replica r circularly shifts each vector by r dims — an
  *    orthogonal transform, so intra-replica geometry (norms, pairwise
  *    cosines, cluster structure) is IDENTICAL and cross-replica vectors
  *    decorrelate, exactly what 10× more data from the same embedding
  *    model looks like.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [K=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    /** cross-join the K replica indices and shift the given key columns by
      * r·span each; all other columns ride along unchanged. */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val reps = spark.range(k).select(col("id").as("rep"))
      shifts.foldLeft(df.crossJoin(reps)) { case (d, (c, span)) =>
        d.withColumn(c, col(c) + col("rep") * span)
      }.drop("rep")
    }

    // dims copied verbatim: a 10× fact scale-out against the same
    // dimensions is the realistic shape, and keeps every dim join broadcast
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      write(t(n), n, 1)
    }

    val nOrders = t("orders").count() // 150k at sf0.1
    write(replicate(t("orders"), "o_orderkey" -> nOrders, "o_custkey" -> 0L),
      "orders", 16)
    write(replicate(t("lineitem"), "l_orderkey" -> nOrders), "lineitem", 32)

    val nEvents = t("events").count()
    val nUsers = 1500L
    write(replicate(t("events"), "event_id" -> nEvents, "user_id" -> nUsers),
      "events", 16)

    // documents: key shift + per-replica vocabulary rotation
    val nDocs = t("documents").count()
    val vocab = t("documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().orderBy("w").as[String].collect()
    val v = vocab.length
    val rot = udf { (text: String, rep: Int) =>
      if (rep == 0) text
      else {
        val idx = vocab.zipWithIndex.toMap
        text.split(' ').map { w =>
          idx.get(w) match {
            case Some(i) => vocab((i + rep) % v)
            case None    => w
          }
        }.mkString(" ")
      }
    }
    val docs = t("documents").crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") + col("rep") * nDocs)
      .withColumn("text", rot(col("text"), col("rep").cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
    write(docs, "documents", 8)

    // embeddings: key shift + per-replica circular dim shift (orthogonal)
    val nVecs = t("embeddings").count()
    val dim = t("embeddings").select(size(col("embedding"))).as[Int].head()
    val emb = t("embeddings").crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("vec_id", col("vec_id") + col("rep") * nVecs)
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(concat(
          slice(col("embedding"), col("rep").cast("int") + 1,
            lit(dim) - col("rep").cast("int")),
          slice(col("embedding"), lit(1), col("rep").cast("int")))))
      .drop("rep")
    write(emb, "embeddings", 4)

    // loud receipt so the bench log records exactly what world it measured
    Seq("orders", "lineitem", "documents", "embeddings", "events").foreach { n =>
      println(s"[scaleup] $n: ${spark.read.parquet(s"$dst/$n.parquet").count()} rows")
    }
    spark.stop()
  }
}
