package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.EventOps
import graft.text.TextOps

/** As-of join (union-merge window form) and sequence packing: hand-built
  * fixtures for the semantics edges (inclusive tie, no-prior-right null,
  * right-side tie collapse), plus an independent serial re-derivation and a
  * partitioning-invariance check over the real documents table. */
class AsofPackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, sec: Long, typ: String, value: Double) =
    (id, user, new java.sql.Timestamp(sec * 1000L), typ, value)

  private def eventsDf(rows: Seq[(Long, Long, java.sql.Timestamp, String, Double)]) =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")

  test("asofJoin: latest at-or-before right row, inclusive tie, null when none") {
    val df = eventsDf(Seq(
      ev(1, 10, 100, "view", 1.5),
      ev(2, 10, 200, "view", 2.5),
      ev(3, 10, 200, "purchase", 9.0),  // tie: view@200 visible (inclusive)
      ev(4, 10, 300, "purchase", 9.0),  // latest view@200
      ev(5, 10, 50, "purchase", 9.0),   // before any view -> nulls
      ev(6, 20, 100, "purchase", 9.0),  // user 20 has no views at all
      ev(7, 30, 90, "view", 3.0),
      ev(8, 30, 95, "view", 4.0),       // same user, later view wins
      ev(9, 30, 99, "purchase", 9.0)))
    val out = EventOps.asofJoin(df, "purchase", "view")
      .orderBy("user_id", "left_ts_us", "left_id")
      .select("left_id", "right_id", "right_ts_us", "right_value_micro")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq(
      (5L, None, None, None),
      (3L, Some(2L), Some(200000000L), Some(2500000L)),
      (4L, Some(2L), Some(200000000L), Some(2500000L)),
      (6L, None, None, None),
      (9L, Some(8L), Some(95000000L), Some(4000000L))))
  }

  test("asofJoin: right rows at identical (user, ts) collapse to max event_id") {
    val df = eventsDf(Seq(
      ev(11, 1, 100, "view", 1.0),
      ev(12, 1, 100, "view", 2.0), // same ts: event_id 12 wins
      ev(13, 1, 150, "purchase", 0.0)))
    val out = EventOps.asofJoin(df, "purchase", "view")
      .select("left_id", "right_id", "right_value_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((13L, 12L, 2000000L)))
  }

  test("asofJoin matches a serial per-user scan on the real events table") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = EventOps.asofJoin(events, "purchase", "view")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => (r._2, (r._4, r._5))).toMap
    // independent serial re-derivation from the raw rows
    val raw = events
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val viewsByUser = raw.filter(_._4 == "view")
      .groupBy(_._2).map { case (u, vs) =>
        // collapse ties per ts to max event_id, then sort by ts
        u -> vs.groupBy(_._3).map { case (ts, g) => (ts, g.map(_._1).max) }
          .toArray.sortBy(_._1)
      }
    var checked = 0
    raw.filter(_._4 == "purchase").foreach { case (pid, u, pts, _) =>
      val expect = viewsByUser.get(u)
        .flatMap(vs => vs.takeWhile(_._1 <= pts).lastOption)
      val got = out(pid)
      assert(got._1 === expect.map(_._2), s"purchase $pid right_id")
      assert(got._2 === expect.map(_._1), s"purchase $pid right_ts")
      checked += 1
    }
    assert(checked > 0)
  }

  test("packSequences: serial re-derivation, offsets in budget, spans contiguous") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val budget = 64
    val out = TextOps.packSequences(docs, budgetTokens = budget, buckets = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // serial truth: per bucket, docs in doc_id order, running token chop
    val toks = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect()
    val byBucket = toks.groupBy { case (id, _) => ((id % 1000003L) * 2654435761L) % 8L }
    var checked = 0
    byBucket.foreach { case (bucket, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, n) =>
        val start = cum; cum += n
        val (_, b, nt, sf, sl, off) = out(id)
        assert(b === bucket && nt === n, s"doc $id bucket/tokens")
        assert(sf === bucket * 4294967296L + start / budget, s"doc $id seq_first")
        assert(sl === bucket * 4294967296L + (cum - 1) / budget, s"doc $id seq_last")
        assert(off === start % budget && off >= 0 && off < budget, s"doc $id offset")
        checked += 1
      }
    }
    assert(checked === toks.length && checked > 0)
  }

  test("packSequences is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.packSequences(docs, 64, 8).collect().toSet
    val b = TextOps.packSequences(docs.repartition(7), 64, 8).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("transitionMatrix: hand-built chains, ppm rows sum ≤ 1e6, cross-user isolation") {
    // user 1: a → b → a → c ; user 2: a → b   (no transition crosses users)
    val df = eventsDf(Seq(
      ev(1, 1, 10, "a", 0), ev(2, 1, 20, "b", 0), ev(3, 1, 30, "a", 0),
      ev(4, 1, 40, "c", 0), ev(5, 2, 15, "a", 0), ev(6, 2, 25, "b", 0)))
    val got = EventOps.transitionMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // from a: a→b twice (u1, u2), a→c once → ppm 666666 / 333333
    assert(got(("a", "b")) === ((2L, 666666L)))
    assert(got(("a", "c")) === ((1L, 333333L)))
    assert(got(("b", "a")) === ((1L, 1000000L)))
    assert(got.size === 3) // c is terminal, u2's b is terminal
    // equal-ts tie broken by event_id: two same-second events order by id
    val tie = eventsDf(Seq(ev(7, 3, 50, "x", 0), ev(8, 3, 50, "y", 0)))
    val t2 = EventOps.transitionMatrix(tie).collect()
    assert(t2.length === 1 &&
      t2.head.getString(0) === "x" && t2.head.getString(1) === "y")
  }

  test("cusum: hand-relaxed recurrence — floor at 0, alarm resets, first-alarm ts, cross-user isolation") {
    // target = 10 units (1e7 micros), h = 15 units (1.5e7 micros)
    // user 1: values 5, 30, 12, 25  → s: max(0,-5)=0, 20→ALARM reset,
    //   2, 17→ALARM reset; peaks 20 then 17 → peak 20, 2 alarms, first at ts 20
    // user 2: values 12, 12 → s: 2, 4 — never alarms, peak 4e6
    // user 3: equal-ts pair ordered by event_id: 30 then 0:
    //   s: 20→ALARM reset, 0 — 1 alarm at ts 50 (id 6 first)
    val df = eventsDf(Seq(
      ev(1, 1, 10, "a", 5.0), ev(2, 1, 20, "a", 30.0),
      ev(3, 1, 30, "a", 12.0), ev(4, 1, 40, "a", 25.0),
      ev(5, 2, 10, "a", 12.0), ev(9, 2, 20, "a", 12.0),
      ev(6, 3, 50, "a", 30.0), ev(7, 3, 50, "a", 0.0)))
    val got = EventOps.cusum(df, targetMicro = 10000000L, hMicro = 15000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((4L, 2L, 20000000L, 20000000L)))
    assert(got(2L) === ((2L, 0L, -1L, 4000000L)))
    assert(got(3L) === ((2L, 1L, 50000000L, 20000000L)))
  }

  test("zscoreOutliers: exact integer 1.5σ test — boundary, constant stream, brute-force parity") {
    // user 1: values 0,0,0,0,15 (milli 0,0,0,0,15000): n=5, s1=15000,
    //   s2=225e6, var_num=5·225e6−225e6=9e8; dev for x=15000:
    //   5·15000−15000=60000 → 4·3.6e9=1.44e10 ≥ 9·9e8=8.1e9 → outlier;
    //   dev for x=0: −15000 → 4·2.25e8=9e8 < 8.1e9 → not
    // user 2: constant 7.0 → var 0, dev 0 → zero outliers
    val df = eventsDf(Seq(
      ev(1, 1, 10, "a", 0.0), ev(2, 1, 20, "a", 0.0), ev(3, 1, 30, "a", 0.0),
      ev(4, 1, 40, "a", 0.0), ev(5, 1, 50, "a", 15.0),
      ev(6, 2, 10, "a", 7.0), ev(7, 2, 20, "a", 7.0)))
    val got = EventOps.zscoreOutliers(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((5L, 15000L, 900000000L, 1L)))
    assert(got(2L) === ((2L, 14000L, 0L, 0L)))
  }

  test("abChiSquare: hand-built 2x2 — cells, rational, and the 3.841 verdict both ways") {
    // users 0..3: buckets 0,1,0,1. spends (micro): u0 700, u2 100 (A: 1
    // conv, 1 not), u1 650, u3 900 (B: 2 conv, 0 not) — threshold 600
    val df = eventsDf(Seq(
      ev(1, 0, 10, "purchase", 700.0), ev(2, 2, 10, "purchase", 100.0),
      ev(3, 1, 10, "purchase", 650.0), ev(4, 3, 10, "purchase", 900.0),
      ev(5, 0, 20, "view", 999.0))) // non-purchase never counts
    val r = EventOps.abChiSquare(df, minSpendMicro = 600000000L).collect().head
    val (a, b, c, d) = (1L, 1L, 2L, 0L)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((4L, a, b, c, d)))
    val num = 4L * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    assert((r.getLong(5), r.getLong(6)) === ((num, den)))
    // chi² = 16/12 ≈ 1.33 < 3.841 → not significant
    assert(!r.getBoolean(7))
    // an extreme split IS significant: A all converts, B none (3 users each)
    val ext = eventsDf((1 to 3).map(i => ev(i, i * 2L, 10, "purchase", 900.0)) ++
      (4 to 6).map(i => ev(i, i * 2 + 1L, 10, "purchase", 100.0)))
    assert(EventOps.abChiSquare(ext, minSpendMicro = 600000000L)
      .collect().head.getBoolean(7)) // chi² = 6 ≥ 3.841
  }

  test("lagCrossCorr: perfect lag-1 lead detected exactly; zero-fill counts empty buckets") {
    // X fires in buckets 0 and 2 (600s buckets), Y mirrors one bucket later
    // (1 and 3); bucket 4 has an unrelated event to stretch the grid to 5.
    // series x = (1,0,1,0,0), y = (0,1,0,1,0)
    val df = eventsDf(Seq(
      ev(1, 1, 10, "view", 0), ev(2, 1, 1210, "view", 0),
      ev(3, 2, 610, "purchase", 0), ev(4, 2, 1810, "purchase", 0),
      ev(5, 3, 2500, "error", 0)))
    val got = EventOps.lagCrossCorr(df, "view", "purchase", 600L, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    // lag 0: pairs over all 5 buckets; Σxy = 0 → cov = 5·0 − 2·2 = −4
    assert(got(0L) === ((5L, 0L, -4L)))
    // lag 1: 4 pairs (x_t, y_t+1): (1,1),(0,0),(1,1),(0,0) → Σxy=2,
    // Σx=2 (buckets 0..3), Σy=2 (buckets 1..4) → cov = 4·2 − 4 = 4 > 0
    assert(got(1L) === ((4L, 2L, 4L)))
    // lag 2: 3 pairs: x=(1,0,1) vs y=(0,1,0) → Σxy = 0, cov = −2·1...
    // Σx(0..2)=2, Σy(2..4)=1 → cov = 3·0 − 2 = −2
    assert(got(2L) === ((3L, 0L, -2L)))
    // the lag-1 lead dominates: cov(1) is the unique positive numerator
    assert(got(1L)._3 > 0 && got(0L)._3 < 0 && got(2L)._3 < 0)
  }

  test("behaviorEntropy: single-type user → 0, uniform two-type exact, threshold verdict") {
    def ln9(x: Long): Long = Math.round(math.log(x.toDouble) * 1e9)
    val df = eventsDf(Seq(
      ev(1, 1, 10, "a", 0), ev(2, 1, 20, "a", 0), ev(3, 1, 30, "a", 0),
      ev(4, 2, 10, "a", 0), ev(5, 2, 20, "b", 0),
      ev(6, 2, 30, "a", 0), ev(7, 2, 40, "b", 0)))
    // user 1: one type → ent 0. user 2: 2+2 of a/b → ent_num = 4·ln9(4) − 4·ln9(2)
    val got = EventOps.behaviorEntropy(df, minNanoNats = 600000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) === ((3L, 1L, 0L, false)))
    val e2 = 4L * ln9(4) - 4L * ln9(2) // = 4·ln9(2) up to rounding → H = ln 2
    assert(got(2L) === ((4L, 2L, e2, e2 >= 600000000L * 4)))
    assert(got(2L)._4) // ln 2 ≈ 0.693 nats ≥ 0.6 → balanced
  }

  test("spendGini: equal spenders → 0; one-whale pair → exactly 1/2; rank ties break on user_id") {
    val equal = eventsDf(Seq(ev(1, 1, 10, "purchase", 5.0), ev(2, 2, 20, "purchase", 5.0)))
    val g1 = EventOps.spendGini(equal).collect().head
    assert(g1.getLong(2) === 0L && g1.getLong(4) === 0L)
    // users 1 (spend 0-ish: value 0.0) and 2 (10.0): G = 1/2 exactly
    val whale = eventsDf(Seq(ev(1, 1, 10, "a", 0.0), ev(2, 2, 20, "a", 10.0)))
    val g2 = EventOps.spendGini(whale).collect().head
    assert((g2.getLong(0), g2.getLong(1)) === ((2L, 10000000L)))
    assert(g2.getLong(2) * 2 === g2.getLong(3)) // num/den = 1/2
    assert(g2.getLong(4) === 500L)
  }

  test("funnel: strict-after chaining — order matters, equal ts does not advance") {
    val rows = Seq(
      // user 1 completes A→B in order
      ev(1, 1, 10, "A", 0), ev(2, 1, 20, "B", 0),
      // user 2 has B BEFORE A only → must not reach stage 2
      ev(3, 2, 20, "B", 0), ev(4, 2, 30, "A", 0),
      // user 3: B at the SAME ts as A → strict > excludes it
      ev(5, 3, 10, "A", 0), ev(6, 3, 10, "B", 0),
      // user 4: first A at 50, stale B at 40, valid B at 60 → advances
      ev(7, 4, 50, "A", 0), ev(8, 4, 40, "B", 0), ev(9, 4, 60, "B", 0),
      // user 5: B only, never signs up → not even stage 1
      ev(10, 5, 5, "B", 0))
    val got = EventOps.funnel(eventsDf(rows), Seq("A", "B"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 4L, 2 -> 2L), got) // stage1: users 1,2,3,4; stage2: 1,4
  }
}
