package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Resumable stage checkpointing with per-partition lineage (generalizes the
  * reference's skip-if-output-exists restart behavior, downloadways.js:86-105,
  * per the north_rule: "every stage checkpoints per-partition lineage + row
  * counts so a killed job resumes without recompute").
  *
  * No Iceberg jar ships in this environment (SURVEY §7.0), so the table layer
  * is Parquet + an atomically-renamed JSON manifest holding per-partition row
  * counts and content hashes. A stage is skipped iff its manifest is valid
  * and the input fingerprint matches; otherwise it recomputes and atomically
  * replaces output + manifest (write-to-temp, rename).
  */
object Lineage {

  case class PartStat(partition: Long, rows: Long, contentHash: Long)

  /** content fingerprint of a DataFrame: per-partition row counts + an
    * order-insensitive xor-of-row-hashes (stable under shuffle, ANSI-safe). */
  def partStats(df: DataFrame): Array[PartStat] = {
    val cols = df.columns.map(col).toIndexedSeq
    df.select(spark_partition_id().cast("long").as("p"),
        xxhash64(cols: _*).as("h"))
      .groupBy("p")
      .agg(count(lit(1)).as("rows"),
        // xor is order-insensitive and overflow-free (ANSI mode safe)
        expr("bit_xor(h)").as("hxor"))
      .collect()
      .map(r => PartStat(r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def manifestPath(dir: String) = Paths.get(dir, "_lineage_manifest.json")

  def writeManifest(dir: String, inputFingerprint: Long, stats: Array[PartStat]): Unit = {
    val json = new StringBuilder
    json ++= s"""{"input_fingerprint":$inputFingerprint,"partitions":["""
    json ++= stats.sortBy(_.partition).map(s =>
      s"""{"p":${s.partition},"rows":${s.rows},"hash":${s.contentHash}}""").mkString(",")
    json ++= "]}"
    val tmp = Paths.get(dir, "._lineage_manifest.json.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(tmp, json.toString)
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifestFingerprint(dir: String): Option[Long] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val m = """"input_fingerprint":(-?\d+)""".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong)
    }
  }

  /** manifest totals for skip-path validation: (sum of rows, xor of the
    * per-partition content hashes — partition-layout independent, since xor
    * of per-partition bit_xor equals the global bit_xor). */
  def readManifestTotals(dir: String): Option[(Long, Long)] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val rows = """"rows":(-?\d+)""".r.findAllMatchIn(s).map(_.group(1).toLong).toSeq
      val hashes = """"hash":(-?\d+)""".r.findAllMatchIn(s).map(_.group(1).toLong).toSeq
      Some((rows.sum, hashes.foldLeft(0L)(_ ^ _)))
    }
  }

  /** order-insensitive fingerprint of an input DataFrame (cheap: sum of
    * 64-bit row hashes — collision-safe enough for resume decisions). */
  def fingerprint(df: DataFrame): Long = {
    val cols = df.columns.sorted.map(col).toIndexedSeq
    val r = df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Run `stage` and persist to `outDir` unless a valid checkpoint for the
    * same input fingerprint already exists; returns the (possibly reloaded)
    * output. This is the resume path: a killed job re-invokes materialize
    * and every finished stage short-circuits to a parquet read.
    *
    * Crash safety: the manifest is DELETED before the data rewrite starts —
    * a job killed mid-overwrite leaves data without a manifest, which can
    * only recompute, never serve the torn files. The skip path re-validates
    * the stored parquet against the manifest's row count and xor-of-hashes
    * (partition-layout independent), so a manifest that survived alongside
    * corrupted/foreign data is detected and recomputed too. */
  def materialize(spark: SparkSession, outDir: String, input: DataFrame,
                  stage: DataFrame => DataFrame): DataFrame = {
    val fp = fingerprint(input)
    val valid = readManifestFingerprint(outDir) match {
      case Some(existing) if existing == fp =>
        val stored = spark.read.parquet(s"$outDir/data")
        val actual = {
          val stats = partStats(stored)
          (stats.map(_.rows).sum, stats.map(_.contentHash).foldLeft(0L)(_ ^ _))
        }
        readManifestTotals(outDir).contains(actual)
      case _ => false
    }
    if (valid) spark.read.parquet(s"$outDir/data")
    else {
      // invalidate FIRST: no window where an old manifest covers new bytes
      Files.deleteIfExists(manifestPath(outDir))
      stage(input).write.mode("overwrite").parquet(s"$outDir/data")
      val written = spark.read.parquet(s"$outDir/data")
      writeManifest(outDir, fp, partStats(written))
      written
    }
  }
}
