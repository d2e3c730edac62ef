package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.exprs.fns

/** Similarity search over the `embeddings` table (vec_id, embedding
  * array<float>, label): brute-force cosine top-k baseline + an LSH-bucketed
  * approximate variant for the 100 TB scale path.
  */
object SimOps {

  /** brute-force cosine top-k: queries (small, broadcast) × corpus.
    * Ranking key is round(cos*1e9) desc then vec_id asc so ordering is
    * engine-reproducible. */
  def bruteForceTopK(embeddings: DataFrame, queryPred: org.apache.spark.sql.Column,
                     k: Int): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cand = broadcast(q).join(embeddings, col("q_id") =!= col("vec_id"))
      .withColumn("cos", fns.cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("cos9", round(col("cos") * lit(1e9), 0).cast("long"))
    val w = Window.partitionBy("q_id").orderBy(col("cos9").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor"),
        (col("cos9").cast("double") / lit(1e9)).as("cos_sim"))
  }

  /** deterministic pseudo-random hyperplanes for sign-LSH (splitmix64 per
    * (table, plane, dim), mapped to [-1, 1)). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    hyperplanesFor(0, nPlanes, dim)

  def hyperplanesFor(table: Int, nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p0 =>
      val p = table * 1000 + p0
      Array.tabulate(dim) { d =>
        var z = p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L + 0x1234567L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        (z & 0xffffffffL).toDouble / 2147483648.0 - 1.0
      }
    }

  /** sign-LSH bucket key: nPlanes sign bits of dot(embedding, plane). */
  def lshBucket(emb: org.apache.spark.sql.Column, planes: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val dot = aggregate(
        zip_with(emb, lit(plane), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a + b)
  }

  /** Multi-table sign-LSH ANN: `tables` independent plane sets of `nPlanes`
    * bits each; candidates = union over tables of same-bucket rows (the
    * standard LSH recall amplifier: P(hit) = 1-(1-p^k)^T). Scale path: each
    * table is an equi-join on (table, bucket) — no all-pairs product.
    * Approximate — recall measured in tests against bruteForceTopK. */
  def lshTopK(embeddings: DataFrame, queryPred: org.apache.spark.sql.Column,
              k: Int, nPlanes: Int = 4, tables: Int = 8, dim: Int = 64): DataFrame = {
    val bucketCols = (0 until tables).map { t =>
      lshBucket(col("embedding"), hyperplanesFor(t, nPlanes, dim)).as(s"b$t")
    }
    val withB = embeddings.select(col("*") +: bucketCols: _*)
      .select(col("vec_id"), col("embedding"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val q = withB.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("tbl"), col("bucket"))
    val cand = broadcast(q).join(withB, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos", fns.cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("cos9", round(col("cos") * lit(1e9), 0).cast("long"))
    val w = Window.partitionBy("q_id").orderBy(col("cos9").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor"),
        (col("cos9").cast("double") / lit(1e9)).as("cos_sim"))
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path
    * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * IVF part): every corpus vector is assigned to its nearest of `nlist`
    * centroids (the inverted list) in one map-side pass; a query probes only
    * its `nprobe` nearest lists and ranks those candidates by exact cosine.
    *
    * Centroids here are deterministic seeds (the vectors with
    * vec_id < nlist) rather than k-means iterates, so the assignment is
    * reproducible in plain SQL and the whole operator is exact-oracle-able;
    * swapping in trained centroids changes recall, not the plan. The
    * quantizer is collected to the driver by construction — at 100 TB it is
    * a small offline-trained artifact (kB–MB), never data-sized, so this is
    * the correct scale shape, not a data collect. Candidate generation is an
    * equi-join on list_id; with the corpus partitioned/bucketed by list_id
    * at rest, a query touches ~nprobe/nlist of the data and the join is
    * co-located. Ties (equal rounded cosine) break to the smallest centroid
    * id in both engines. */
  def ivfTopK(embeddings: DataFrame, queryPred: org.apache.spark.sql.Column,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents: Array[(Long, Array[Float])] = embeddings
      .filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def c9(e: org.apache.spark.sql.Column, ce: Array[Float]): org.apache.spark.sql.Column =
      round(fns.cosine_sim(e, lit(ce)) * lit(1e9), 0).cast("long")
    // nearest centroid = max (cos9, -cid) struct → smallest cid on ties
    def listId(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val scored = array(cents.map { case (cid, ce) =>
        struct(c9(e, ce).as("c9"), lit(-cid).as("ncid"))
      }: _*)
      -array_max(scored).getField("ncid")
    }
    val assigned = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("list_id", listId(col("embedding")))
    val qs = embeddings.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy("q_id")
      .orderBy(col("sc.c9").desc, col("sc.cid"))
    val probes = qs
      .select(col("q_id"), col("q_emb"), explode(array(cents.map { case (cid, ce) =>
        struct(c9(col("q_emb"), ce).as("c9"), lit(cid).as("cid"))
      }: _*)).as("sc"))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("sc.cid").as("p_list"))
    val cand = broadcast(probes)
      .join(assigned, col("p_list") === col("list_id") && col("q_id") =!= col("vec_id"))
      .withColumn("cos9",
        round(fns.cosine_sim(col("q_emb"), col("embedding")) * lit(1e9), 0).cast("long"))
    val w = Window.partitionBy("q_id").orderBy(col("cos9").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor"),
        (col("cos9").cast("double") / lit(1e9)).as("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs via MULTI-TABLE sign-LSH buckets.
    * Single-table recall at cos θ is p^k with p = 1−θ/π (round 1 shipped one
    * table: recall ≈ 0.43 at cos 0.95 — near-dups were silently dropped);
    * T independent tables amplify to 1−(1−p^k)^T ≈ 0.9997 at cos 0.9 with
    * k=8, T=16. Scale shape: candidate generation is an equi-join on
    * (table, bucket) over NARROW (id) rows; embeddings join back per id for
    * exact cosine verification (pairs ≪ n²), so precision is exact and only
    * recall is probabilistic. Identical embeddings collapse into one bucket —
    * bucket size is bounded by the near-dup cluster size, which dedup use
    * cases keep small; a salting pass (graft.ops.Skew) is the escape hatch
    * for pathological clusters. */
  def cosineNearDupPairs(embeddings: DataFrame, cosMin: Double,
                         nPlanes: Int = 8, tables: Int = 16, dim: Int = 64): DataFrame = {
    val bucketCols = (0 until tables).map { t =>
      lshBucket(col("embedding"), hyperplanesFor(t, nPlanes, dim)).as(s"b$t")
    }
    val withB = embeddings.select(col("vec_id") +: col("embedding") +: bucketCols: _*)
      .select(col("vec_id"),
        posexplode(array((0 until tables).map(t => col(s"b$t")): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val l = withB.select(col("tbl"), col("bucket"), col("vec_id").as("id1"))
    val r = withB.select(col("tbl"), col("bucket"), col("vec_id").as("id2"))
    val pairs = l.join(r, Seq("tbl", "bucket")).filter(col("id1") < col("id2"))
      .select("id1", "id2").dropDuplicates("id1", "id2")
    val e1 = embeddings.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val e2 = embeddings.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    pairs.join(e1, Seq("id1")).join(e2, Seq("id2"))
      .withColumn("cos", fns.cosine_sim(col("e1"), col("e2")))
      .filter(col("cos") >= cosMin)
      .select("id1", "id2", "cos")
  }
}
