package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SpatialOps

/** Physical-plan regression guards for the scale-critical properties: these
  * are the shapes that make the engine survive 100 TB, so a refactor that
  * silently loses one (a re-broadcast big side, a lost pushdown, a global
  * sort sneaking in) must fail tests, not just run slower. Assertions run
  * with AQE off so the pre-execution plan is deterministic. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("parquet scan: filter pushdown + column pruning reach the reader") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "click")
      .select("user_id", "value")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(event_type,click)"), s"no pushed filter in:\n$plan")
    // pruned read schema: the scan must not fetch ts/event_type payload cols
    // beyond what the filter needs
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(l => "struct<[^>]*>".r.findFirstIn(l)).getOrElse("")
    assert(readSchema.contains("user_id") && readSchema.contains("value") &&
      !readSchema.contains("ts:"), s"unpruned scan: $readSchema")
  }

  test("imageWayCellJoin default: segment side shuffled-hash, never broadcast") {
    val (g, _, wayData) = Pipeline.prepared(spark, sf)
    val images = graft.synth.Synth.images(spark, sf, g, withBytes = false)
    val joined = SpatialOps.imageWayCellJoin(
      graft.synth.Synth.withGeotag(images, g), wayData, res = 3, maxDistDeg = 0.001)
    val plan = planOf(joined)
    assert(plan.contains("ShuffledHashJoin"), s"no shuffled-hash join in:\n$plan")
    // the cell join of images×segments must not broadcast either side (the
    // names join-back may broadcast a projection — that one scales with the
    // DISTINCT name table, not the segment index)
    val cellJoinIdx = plan.indexOf("ShuffledHashJoin [cell")
    assert(cellJoinIdx >= 0, s"cell equi-join not shuffled-hash:\n$plan")
  }

  test("top-n query plans as TakeOrdered, not a global sort") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val top = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    val plan = planOf(top)
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-n:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"range exchange for top-n:\n$plan")
  }

  test("aggregation is partial before the shuffle (map-side combine)") {
    val (_, _, wayData) = Pipeline.prepared(spark, sf)
    val agg = wayData.select(explode(col("nodes")).as("node_id"))
      .groupBy("node_id").count()
    val plan = planOf(agg)
    val aggCount = "HashAggregate".r.findAllIn(plan).size
    assert(aggCount >= 2 && plan.contains("partial_count"),
      s"no partial aggregation:\n$plan")
  }

  test("bucketed co-partitioned tables join with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS plan_spec_a")
    spark.sql("DROP TABLE IF EXISTS plan_spec_b")
    val df = spark.range(1000).select(
      (col("id") % 50).as("cell"), col("id").as("v"))
    df.write.mode("overwrite").bucketBy(8, "cell").saveAsTable("plan_spec_a")
    df.write.mode("overwrite").bucketBy(8, "cell").saveAsTable("plan_spec_b")
    val j = spark.table("plan_spec_a")
      .join(spark.table("plan_spec_b").withColumnRenamed("v", "w"), Seq("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val plan = planOf(j)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS plan_spec_a")
    spark.sql("DROP TABLE IF EXISTS plan_spec_b")
  }

  test("cityFringe is a ZERO-exchange plan (broadcast-constant polygons, map-side distances)") {
    val (g, _, _) = Pipeline.prepared(spark, sf)
    val df = SpatialOps.cityFringe(Pipeline.geoImages(spark, sf),
      graft.synth.Synth.cityPolys(g), dDeg = 0.003)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"cityFringe gained a shuffle:\n$plan")
  }

  test("stratifiedQuota selection runs through the native topk_agg partial/final pair, not a window") {
    val df = spark.range(100).select(lit("g").as("g"), col("id"))
    val plan = planOf(graft.ops.SampleOps.stratifiedQuota(df, Seq("g"), col("id"), 5))
    // the k-bounded aggregate must appear in BOTH partial and final stages
    // (map-side combine before the exchange), and no window/sort may appear
    assert(plan.contains("topk_agg"), s"no native topk_agg in:\n$plan")
    assert(plan.contains("partial_topk_agg"), s"no partial (map-side) stage:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked into the quota cut:\n$plan")
  }

  test("bpeEncode broadcasts the vocabulary, never the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (_, vocab) = graft.text.TextOps.bpeTrain(docs.limit(50), nMerges = 1)
    val plan = planOf(graft.text.TextOps.bpeEncode(docs, vocab))
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
  }
}
