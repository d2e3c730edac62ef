package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.sim.SimOps
import graft.synth.Bmp
import graft.ops.ImageOps

/** Dedup / similarity / multimodal verification against brute force and
  * javax.imageio (the in-JDK decode oracle). */
class DedupSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("PPJoin prefix filter: hot shingle generates ZERO candidates; rowset matches brute force") {
    // 120 docs that all share one stop-shingle ("hot hot hot", df = 120) and
    // are otherwise disjoint: a plain inverted-index join fans out to
    // 120·119/2 = 7140 candidate pairs through that one shingle. Each doc
    // has 5 shingles; at t = 0.3 the prefix is the 4 RAREST, which excludes
    // the hot one → zero candidates, zero output (correct: all true jaccards
    // are 1/9 < 0.3).
    val hotDocs = (0 until 120).map(i =>
      (i.toLong, "en", "src0", s"a$i b$i c$i d$i hot hot hot"))
      .toDF("doc_id", "lang", "source", "text")
    assert(TextOps.prefixCandidates(hotDocs, 0.3).count() === 0L)
    assert(TextOps.ngramJaccardPairs(hotDocs, 0.3).count() === 0L)

    // exactness on a corpus WITH true near-dups: prefix-filtered result ==
    // brute-force quadratic jaccard over the same shingle sets
    val base = (0 until 40).map(i =>
      (i.toLong, "en", "src0", (0 until 30).map(j => s"w${(i * 3 + j * 5) % 25}").mkString(" ")))
    val near = base.take(12).map { case (i, l, s, t) =>
      (200 + i, l, s, t.split(" ").updated(2, "X").mkString(" ")) }
    val docs = (base ++ near).toDF("doc_id", "lang", "source", "text")
    val got = TextOps.ngramJaccardPairs(docs, 0.2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    def sh(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = base ++ near
    val truth = (for {
      (i, _, _, ti) <- all; (j, _, _, tj) <- all if i < j
      si = sh(ti); sj = sh(tj)
      if si.intersect(sj).size.toDouble / si.union(sj).size >= 0.2
    } yield (i, j)).toSet
    assert(truth.nonEmpty)
    assert(got === truth)
  }

  test("BM25: two-term docs outrank one-term docs; scores descend; idf favors rare terms") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // both query terms
      (2L, "alpha gamma delta epsilon"),       // one (common) term
      (3L, "beta gamma delta epsilon"),        // one (rarer) term — beta in 2 docs, alpha in 3
      (4L, "gamma delta epsilon zeta"),        // no query terms
      (5L, "alpha alpha alpha gamma")          // high tf of the common term
    ).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta")).toDF("q_id", "q_text")
    val out = TextOps.bm25TopK(docs, qs, 10)
      .orderBy("rk").as[(Long, Int, Long, Long)].collect()
    assert(out.head._3 === 1L, "doc with both terms must rank first")
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "scores must be non-increasing in rank")
    assert(!out.map(_._3).contains(4L), "doc with no query terms must not appear")
    // idf: beta (df=2) contributes more than alpha (df=3) at equal tf/dl
    val d3 = out.find(_._3 == 3L).get._4
    val d2 = out.find(_._3 == 2L).get._4
    assert(d3 > d2, "rarer term must outscore the more common one")
  }

  test("MinHash LSH finds all high-jaccard pairs (recall vs brute force)") {
    // near-duplicate corpus: base docs + mutated copies
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 60).map(j => s"w${(i * 7 + j * 13) % 40}").mkString(" ")))
    val dups = base.take(10).map { case (i, t) =>
      (100 + i, t.split(" ").updated(3, "CHANGED").mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val lsh = TextOps.minHashLshPairs(spark, docs, bands = 8, rows = 4, jaccardMin = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // brute force ground truth
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = (base ++ dups)
    val truth = (for {
      (i, ti) <- all; (j, tj) <- all if i < j
      si = sh(ti); sj = sh(tj)
      jac = si.intersect(sj).size.toDouble / si.union(sj).size
      if jac >= 0.5
    } yield (i, j)).toSet
    assert(truth.nonEmpty && truth.size >= 10)
    assert(truth.subsetOf(lsh), s"missed: ${truth -- lsh}")
    // verified filter: nothing below threshold sneaks through
    assert(lsh.subsetOf(truth))
  }

  test("containmentPairs: embedded doc found at C=1 where Jaccard dilutes; growth cap excludes") {
    // B = A plus 3x extra content (ratio 4 = at the cap, C(A,B) = 1,
    // J ≈ 1/4 — below any dedup threshold); E = A inside 9x content
    // (ratio > 4: out of the bounded-growth contract, must NOT pair)
    val aTok = (0 until 40).map(i => s"a$i")
    val bTok = aTok ++ (0 until 114).map(i => s"b$i")   // ~4x shingles
    val eTok = aTok ++ (0 until 400).map(i => s"e$i")   // ~10x shingles
    val docs = Seq(
      (1L, aTok.mkString(" "), "en", "web"),
      (2L, bTok.mkString(" "), "en", "web"),
      (3L, eTok.mkString(" "), "en", "web"),
      (4L, (0 until 40).map(i => s"z$i").mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.containmentPairs(docs, cMin = 0.5, growthMax = 4.0)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    val (_, _, inter, nSmall, c) = got.head
    assert(inter === nSmall && c === 1.0) // A's shingles all inside B
  }

  test("matryoshkaRecall: prefix-identical vectors give full recall; prefix-destroyed give less") {
    // 8-dim embeddings, truncate to 4: group X front-loads info (prefix
    // ranking = full ranking -> recall 1); the decoy pair ties on the
    // prefix but differs in the tail
    def v(prefix: Array[Float], tail: Array[Float]) = prefix ++ tail
    val z4 = Array(0f, 0f, 0f, 0f)
    val rows = Seq(
      (0L, v(Array(1f, 0f, 0f, 0f), z4)),                 // query
      (1L, v(Array(1f, 0f, 0f, 0f), z4)),                 // exact dup: top-1 both
      (2L, v(Array(0.9f, 0.1f, 0f, 0f), z4)),             // near, prefix-visible
      (3L, v(Array(0f, 1f, 0f, 0f), z4)),                 // far in both
      (4L, v(Array(0f, 0f, 1f, 0f), Array(1f, 0f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val got = SimOps.matryoshkaRecall(rows, col("vec_id") === 0, k = 2, dims = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 2L, 1000L))) // top-2 preserved by the prefix
  }

  test("tfidfKeywords: rare terms outrank common; ties break on term; k bound holds") {
    val docs = Seq(
      (1L, "common rare1 common common", "en", "web"),
      (2L, "common rare2 rare2 common", "en", "web"),
      (3L, "common common common common", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.tfidfKeywords(docs, k = 2)
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap
    // doc 1: rare1 (tf 1, df 1) beats common (tf 3, df 3: idf = ln(1) = 0)
    assert(got(1L).head === (("rare1", 1L)))
    // doc 2: rare2 tf 2 leads
    assert(got(2L).head === (("rare2", 2L)))
    // doc 3: only 'common' exists -> 1 row despite k = 2
    assert(got(3L) === Seq(("common", 4L)))
    // ln(N/df) = ln(1) = 0 for ubiquitous terms: common's score is 0
    val commonRows = TextOps.tfidfKeywords(docs, k = 2)
      .filter(col("term") === "common").select("score9")
      .as[Long].collect()
    assert(commonRows.forall(_ === 0L))
  }

  test("pmiCollocations: glued pair outranks independent pairs; brute-force parity; minCount prunes") {
    // 'x y' always adjacent (a true collocation); filler words co-occur freely
    val docs = Seq(
      (1L, "x y a b a c x y b a", "en", "web"),
      (2L, "b x y c a b x y a c", "en", "web"),
      (3L, "a c b x y a b c b a", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.pmiCollocations(docs, minCount = 2L, k = 100)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.head._1 === "x" && got.head._2 === "y")
    // brute-force reference with the identical per-factor ln9 combination
    def ln9(x: Long): Long = Math.round(math.log(x.toDouble) * 1e9)
    val tk = Seq("x y a b a c x y b a", "b x y c a b x y a c",
      "a c b x y a b c b a").map(_.split(" ").toSeq)
    val nTok = tk.map(_.size).sum.toLong
    val nBig = tk.map(_.size - 1).sum.toLong
    val uni = tk.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tk.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val want = bi.filter(_._2 >= 2L).map { case ((w1, w2), cb) =>
      (w1, w2, cb, uni(w1), uni(w2),
        ln9(cb) + 2 * ln9(nTok) - ln9(nBig) - ln9(uni(w1)) - ln9(uni(w2)))
    }.toSeq.sortBy(r => (-r._6, r._1, r._2))
    assert(got.toSeq === want)
    // minCount prunes: with minCount above every pair count, nothing survives
    assert(TextOps.pmiCollocations(docs, minCount = 100L, k = 10).count() === 0L)
  }

  test("vocabGrowth: checkpoints, cumulative tokens and first-occurrence vocab match brute force") {
    val docs = Seq(
      (0L, "a b c", "en", "web"), (1L, "a b", "en", "web"),
      (2L, "d", "en", "web"), (3L, "a d e f", "en", "web"),
      (4L, "a", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.vocabGrowth(docs, buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // max_doc = 4 → checkpoints 4·i DIV 4 = 1, 2, 3, 4
    val texts = Map(0L -> "a b c", 1L -> "a b", 2L -> "d", 3L -> "a d e f", 4L -> "a")
    val want = (1 to 4).map { i =>
      val cp = 4L * i / 4
      val in = texts.filter(_._1 <= cp)
      (i.toLong, cp, in.size.toLong,
        in.values.map(_.split(" ").length.toLong).sum,
        in.values.flatMap(_.split(" ")).toSet.size.toLong)
    }
    assert(got === want)
    // the curve is monotone in both coordinates
    assert(got.map(_._4) === got.map(_._4).sorted)
    assert(got.map(_._5) === got.map(_._5).sorted)
  }

  test("sourceDrift: skewed source scores higher than blend-typical; brute-force parity") {
    val docs = Seq(
      (1L, "a b c d", "en", "s1"), (2L, "a b c d", "en", "s1"),
      (3L, "a a a a", "en", "s2"), (4L, "a a b b", "en", "s2"),
      (5L, "a b c d", "en", "s3"), (6L, "d c b a", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.sourceDrift(docs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // brute-force reference with the identical per-factor ln9 combination
    def ln9(x: Long): Long = Math.round(math.log(x.toDouble) * 1e9)
    val corp = Seq("s1" -> "a b c d a b c d", "s2" -> "a a a a a a b b",
      "s3" -> "a b c d d c b a").flatMap { case (s, t) =>
      t.split(" ").map(w => (s, w)) }
    val cw = corp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTot = corp.size.toLong
    val want = corp.groupBy(_._1).map { case (s, ws) =>
      val csw = ws.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ns = ws.size.toLong
      val kl = csw.map { case (w, c) =>
        c * (ln9(c) - ln9(ns) - ln9(cw(w)) + ln9(nTot)) }.sum
      s -> ((ns, csw.size.toLong, kl, kl / ns))
    }
    assert(got === want)
    // s2 (heavily skewed toward 'a') must out-drift the blend-typical s1/s3
    assert(got("s2")._3 > got("s1")._3 && got("s2")._3 > got("s3")._3)
    assert(got("s1")._3 >= 0L && got("s2")._3 >= 0L && got("s3")._3 >= 0L)
  }

  test("zipfFit: exact-rational slope matches brute force; perfect power law fits exactly") {
    def ln6(x: Long): Long = Math.round(math.log(x.toDouble) * 1e6)
    // freqs: a×4, b×2, c×1 → ranks 1,2,3
    val docs = Seq((1L, "a a b c", "en", "web"), (2L, "a a b", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.zipfFit(docs, topN = 40)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val xy = Seq((ln6(1), ln6(4)), (ln6(2), ln6(2)), (ln6(3), ln6(1)))
    val (n, sx, sy, sxy, sx2) = (3L, xy.map(_._1).sum, xy.map(_._2).sum,
      xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum)
    assert(got === ((n, sx, sy, sxy, sx2, n * sxy - sx * sy, n * sx2 - sx * sx)))
    // the slope is negative (frequency falls with rank) and den > 0
    assert(got._6 < 0L && got._7 > 0L)
  }

  test("knnClassify: planted clusters classify correctly; outvoted self-label flags noise; tie → smallest label") {
    // two tight clusters in 4-d: label 1 around e1, label 2 around e2;
    // one MISLABELED vector sits in cluster 1 with label 9 → its
    // neighbors outvote it (correct = false, pred = 1)
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1, 0, 0, 0.00), 1), (2L, v(1, 0, 0, 0.01), 1),
      (3L, v(1, 0, 0, 0.02), 1), (4L, v(1, 0, 0, 0.03), 9), // mislabeled
      (10L, v(0, 1, 0, 0.00), 2), (11L, v(0, 1, 0, 0.01), 2),
      (12L, v(0, 1, 0, 0.02), 2), (13L, v(0, 1, 0, 0.03), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = SimOps.knnClassify(spark, df, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
    // cluster-1 members: 3 NNs are the other cluster-1 vectors
    assert(got(1L) === ((1, 1, 2L, true)))  // neighbors 2,3 (lbl 1) + 4 (lbl 9)
    assert(got(4L) === ((9, 1, 3L, false))) // outvoted → label-noise flag
    assert(got(10L) === ((2, 2, 3L, true)))
    // tie case: isolated pair with distinct labels — 1-NN world
    val tie = Seq((1L, v(1, 0, 0, 0), 5), (2L, v(1, 0, 0, 0.01), 7),
      (3L, v(0, 1, 0, 0), 6)).toDF("vec_id", "embedding", "label")
    val t = SimOps.knnClassify(spark, tie, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // vec 1's neighbors: 2 (lbl 7) and 3 (lbl 6) — 1 vote each → smallest label wins
    assert(t(1L) === 6)
  }

  test("incrementalTextDedup: batch matches corpus and itself; corpus-internal dups never pair; best-match order") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine"
    val corpus = Seq(
      (10L, t1), (11L, t1), // corpus-internal dup — must NOT appear in output
      (12L, t2)).toDF("doc_id", "text")
    val batch = Seq(
      (20L, t1),                                     // dups vs BOTH 10 and 11 → best = min id 10
      (21L, "alpha beta gamma delta epsilon zeta"),  // truncated t1: J = 4/6
      (22L, "totally unrelated words appear here now then"),
      (23L, t2), (24L, t2)                           // 24 also dups 23 (internal) and 12; J=1000 ties → min id 12
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalTextDedup(corpus, batch, tMilli = 200L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.toString.toLong),
          Option(r.get(3)).map(_.toString.toLong))).toMap
    assert(got(20L) === ((false, Some(10L), Some(1000L))))
    assert(got(21L) === ((false, Some(10L), Some(666L)))) // 1000·4 div 6
    assert(got(22L) === ((true, None, None)))
    assert(got(23L) === ((false, Some(12L), Some(1000L))))
    assert(got(24L) === ((false, Some(12L), Some(1000L)))) // tie → smallest id
    assert(got.size === 5) // one row per batch doc, corpus never re-paired
  }

  test("winnowFingerprints: in-JVM reference parity and the w+k-1 match guarantee") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val tk = text.split(" ")
      if (tk.length < k + w - 1) Set.empty
      else {
        val hs = (0 to tk.length - k).map { i =>
          graft.exprs.Hashing.utf8Hash(
            UTF8String.fromString(tk.slice(i, i + k).mkString(" "))) & Long.MaxValue
        }
        (0 to hs.length - w).flatMap { s =>
          // rightmost minimum in window s..s+w-1
          val win = (s until s + w).map(p => (hs(p), p))
          Some(win.minBy { case (h, p) => (h, -p) }).map { case (h, p) => (p, h) }
        }.toSet
      }
    }
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "a completely different document quick brown fox jumps over the end",
      3L -> "too short here") // 3 tokens < k+w-1 → no output
    val docs = texts.map { case (id, t) => (id, t, "en", "web") }
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.winnowFingerprints(docs, k = 3, w = 4)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for ((id, t) <- texts)
      assert(got.getOrElse(id, Set.empty) === ref(t, 3, 4), s"doc $id")
    // guarantee: docs 1 and 2 share the 6-token run "quick brown fox jumps
    // over the" (= w+k-1), so they MUST share a selected hash
    val h1 = got(1L).map(_._2); val h2 = got(2L).map(_._2)
    assert((h1 & h2).nonEmpty)
    assert(!got.contains(3L))
  }

  test("SimHash hamming pairs: identical docs at distance 0") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "x y z q w e r t")).toDF("doc_id", "text")
    val pairs = TextOps.simHashPairs(docs, maxHam = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("rolling fingerprint: equal docs equal, shifted doc equal (winnowing min)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "PREFIX the quick brown fox jumps over the lazy dog again and again")).toDF("doc_id", "text")
    val fp = TextOps.fingerprints(docs, window = 16).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    // min-hash over windows is robust to prefix insertion when the minimal
    // window survives — holds for this fixture
    assert(fp(1L) === fp(3L))
  }

  test("caption alignment: identical pairs keep (cos 1), opposite drop (cos -1), orthogonal keep at >= 0") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // pair 0: identical → cos 1, keep
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),  // pair 1: opposite → cos -1, drop
      (3L, Array(-1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f), 0),  // pair 2: orthogonal → cos 0, keep (>= 0)
      (5L, Array(0.0f, 1.0f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = graft.sim.SimOps.captionAlignment(df, thresholdNano = 0L)
      .orderBy("pair_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq === Seq((0L, 1.0, true), (1L, -1.0, false), (2L, 0.0, true)))
  }

  test("LSH ANN recall ≥ 0.6 vs brute force on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 50 === 0
    val bf = SimOps.bruteForceTopK(emb, pred, 5)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val lsh = SimOps.lshTopK(emb, pred, 5, nPlanes = 4, tables = 8)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("PQ ANN: codes are m small ints; recall vs brute force; exact on codebook seeds") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 50 === 0
    val m = 8; val nCent = 32
    val books = SimOps.pqBooks(emb, m, nCent, 64)
    assert(books.length === m && books(0).length === nCent && books(0)(0).length === 8)
    // code shape: every corpus row → m ids in [0, nCent)
    val codes = emb.select(graft.exprs.fns.pq_encode(col("embedding"), books).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == m && c.forall(x => x >= 0 && x < nCent)))
    // a seed vector reconstructs exactly → its PQ self-similarity is 1.0
    val selfCos = emb.filter(col("vec_id") === 3)
      .select(graft.exprs.fns.pq_adc_cos9(
        graft.exprs.fns.pq_dot_table(col("embedding"), books),
        graft.exprs.fns.pq_encode(col("embedding"), books), books).as("c9"))
      .as[Long].head()
    assert(selfCos === 1000000000L, s"seed self-cos9=$selfCos")
    // recall against exact top-k: pure ADC ranking (8-byte codes only) is
    // weak on this near-uniform corpus (~0.28); the short-list re-rank
    // (ADC candidates → exact cosine) is the shipped default and must be
    // strong
    val bf = SimOps.bruteForceTopK(emb, pred, 5)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val adc = SimOps.pqTopK(emb, pred, 5, m = m, nCentroids = nCent, rerankFactor = 0)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val adcRecall = bf.intersect(adc).size.toDouble / bf.size
    val pq = SimOps.pqTopK(emb, pred, 5, m = m, nCentroids = nCent)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(pq).size.toDouble / bf.size
    System.err.println(s"[pq] ADC-only recall@5 = $adcRecall; reranked recall@5 = $recall")
    assert(adcRecall >= 0.15, s"adcRecall=$adcRecall")
    assert(recall >= 0.6, s"recall=$recall")
    assert(recall >= adcRecall, "re-rank must not lose recall vs pure ADC")
  }

  test("curation pipeline: dedup keeps min doc_id, quality gates, sample is deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again", "en", "web"),
      (2L, "THE QUICK, brown fox jumps over the lazy dog AGAIN and again!!", "en", "books"), // dup of 1 after normalize
      (3L, "short text", "en", "web"), // fails minTokens=10
      (4L, "a b c d e f g h i j k l m n o p", "en", "web"),
      (5L, "a b c d e f g h i j k l m n o p", "en", "web") // exact dup of 4
    ).toDF("doc_id", "text", "lang", "source")
    // sampleNum = buckets → no sampling; isolate dedup+quality behavior
    val kept = TextOps.curate(docs, minTokens = 10, sampleNum = 1 << 20)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L), s"kept=$kept")
    // sampling: deterministic and ~uniform (rate 1/2 over 10k ids)
    val ids = spark.range(10000).select(col("id").as("doc_id"))
    val b = ids.select(TextOps.sampleBucket(col("doc_id")).as("b"))
    val frac = b.filter(col("b") < (1 << 19)).count().toDouble / 10000
    assert(math.abs(frac - 0.5) < 0.02, s"frac=$frac")
    val again = ids.select(TextOps.sampleBucket(col("doc_id")).as("b"))
      .as[Long].collect().toSeq
    assert(again === b.as[Long].collect().toSeq) // bit-identical re-run
  }

  test("source mixing: realized rates converge to weights, deterministic, reps distinct") {
    import spark.implicits._
    val docs = spark.range(8000).select(
      col("id").as("doc_id"), lit("x").as("text"),
      lit("en").as("lang"), concat(lit("s"), col("id") % 4).as("source"))
    val weights = Map("s0" -> 2.5, "s1" -> 1.0, "s2" -> 0.25, "s3" -> 0.0)
    val mixed = TextOps.mixSources(docs, weights)
    val counts = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    // 2000 docs per source; realized/2000 ≈ weight (hash-uniformity slack)
    assert(math.abs(counts("s0") / 2000.0 - 2.5) < 0.05, s"s0=${counts("s0")}")
    assert(counts("s1") === 2000L)
    assert(math.abs(counts("s2") / 2000.0 - 0.25) < 0.05, s"s2=${counts("s2")}")
    assert(!counts.contains("s3"))
    // every (doc, rep) unique; rep dense from 0
    assert(mixed.groupBy("doc_id", "rep").count().filter(col("count") > 1).isEmpty)
    assert(mixed.filter(col("source") === "s0").groupBy("doc_id").count()
      .filter(col("count") < 2 || col("count") > 3).isEmpty) // 2.5× → 2 or 3 copies
    // deterministic: identical output on re-evaluation
    val h1 = mixed.orderBy("doc_id", "rep").collect().toSeq
    val h2 = TextOps.mixSources(docs, weights).orderBy("doc_id", "rep").collect().toSeq
    assert(h1 === h2)
  }

  test("IVF ANN: exhaustive probe equals brute force; nprobe=4 recall reported") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 50 === 0
    // probing every list is exhaustive search — must equal brute force
    // EXACTLY (same cos9 rounding + tie-breaks), which also proves the
    // inverted lists partition the corpus (no vector lost or duplicated)
    val all = SimOps.ivfTopK(emb, pred, 5, nlist = 16, nprobe = 16)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    val bf = SimOps.bruteForceTopK(emb, pred, 5)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    assert(all === bf)
    // nprobe=4/16 path: dense ranks, no self-matches, recall vs brute force
    val ivf = SimOps.ivfTopK(emb, pred, 5, nlist = 16, nprobe = 4)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect()
    ivf.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      rs.foreach { case (q, _, n) => assert(q != n) }
    }
    val ivfSet = ivf.map(t => (t._1, t._3)).toSet
    val bfPairs = bf.map(t => (t._1, t._3))
    val recall = bfPairs.count(ivfSet).toDouble / bfPairs.size
    info(f"IVF nprobe=4/16 recall@5 = $recall%.2f")
    // random synth vectors spread true neighbors uniformly over lists, so
    // the floor is ~nprobe/nlist = 0.25; real clustered embeddings do better
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("thumbnails: nearest-neighbor resize matches hand-computed pixels; unknown fmt passes through") {
    val ph = 0x0123456789abcdefL
    val src = Bmp.forPhash(ph, 8, 8)
    val pngSrc = graft.synth.Codec.encodePng(Bmp.pixels(ph, 8, 8), 8, 8)
    val df = Seq(
      ("i0", "bmp", src),
      ("i1", "png", pngSrc),                      // real codec path (imageio)
      ("i2", "webp", Array[Byte](1, 2, 3)))       // stub path
      .toDF("image_id", "fmt", "bytes")
    val rows = ImageOps.thumbnails(spark, df, 4, 4).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Array[Byte]]("thumb"), r.getAs[Boolean]("decode_ok")))).toMap
    val (rgb8, w8, h8) = Bmp.decode(src)
    assert(w8 === 8 && h8 === 8)
    for (id <- Seq("i0", "i1")) { // png carries the SAME pixels, lossless
      assert(rows(id)._2 === true)
      val (rgb4, w4, h4) = Bmp.decode(rows(id)._1)
      assert(w4 === 4 && h4 === 4)
      for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
        val sy = y * 8 / 4; val sx = x * 8 / 4
        assert(rgb4((y * 4 + x) * 3 + c) === rgb8((sy * 8 + sx) * 3 + c),
          s"$id pixel ($x,$y) channel $c")
      }
    }
    assert(rows("i2")._1.toSeq === Seq[Byte](1, 2, 3), "stub fmt must pass through unchanged")
    assert(rows("i2")._2 === false)
  }

  test("frame sampling slices byte-exact decodable frames without decoding") {
    val w = 16; val h = 9; val n = 24
    def frame(vid: Long, f: Int): Array[Byte] =
      Bmp.encode(Bmp.pixels(vid * 1000 + f, w, h), w, h)
    val videos = Seq(1L, 2L).map { vid =>
      val bytes = (0 until n).map(frame(vid, _)).reduce(_ ++ _)
      (s"v$vid", "bmp", w, h, n, bytes)
    } :+ (("v_gif", "gif", w, h, n, Array.fill[Byte](100)(0))) // stub path
    val df = videos.toDF("video_id", "fmt", "w", "h", "n_frames", "bytes")
    val out = graft.ops.ImageOps.sampleFrames(spark, df, everyK = 5)
      .as[(String, Int, Array[Byte])].collect()
    // 1-in-5 of 24 frames -> indices 0,5,10,15,20 per bmp video; gif skipped
    assert(out.map(t => (t._1, t._2)).sorted.toSeq ===
      (for (v <- Seq("v1", "v2"); f <- Seq(0, 5, 10, 15, 20)) yield (v, f)).sorted)
    out.foreach { case (vidS, f, bytes) =>
      val vid = vidS.drop(1).toLong
      assert(bytes.toSeq === frame(vid, f).toSeq, s"frame ($vidS,$f) not byte-exact")
      val (rgb, dw, dh) = Bmp.decode(bytes) // sampled frame stands alone
      assert(dw === w && dh === h && rgb.length === w * h * 3)
    }
  }

  test("frame sampling: mjpeg frames split on EOI markers byte-exact, each independently decodable") {
    import graft.synth.Codec
    val w = 16; val h = 9; val n = 11
    def jframe(vid: Long, f: Int): Array[Byte] =
      Codec.encodeJpeg(Codec.smoothPixels(vid * 1000 + f, w, h), w, h)
    val frames = (0 until n).map(jframe(7L, _))
    assert(frames.map(_.length).distinct.size > 1, "variable-size frames exercise the scan")
    val df = Seq(("v7", "jpeg", w, h, n, frames.reduce(_ ++ _)))
      .toDF("video_id", "fmt", "w", "h", "n_frames", "bytes")
    val out = graft.ops.ImageOps.sampleFrames(spark, df, everyK = 3)
      .as[(String, Int, Array[Byte])].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(0, 3, 6, 9))
    out.foreach { case (_, f, bytes) =>
      assert(bytes.toSeq === frames(f).toSeq, s"jpeg frame $f not byte-exact")
      val (rgb, dw, dh) = Codec.decode(bytes) // stands alone
      assert(dw === w && dh === h && rgb.length === w * h * 3)
    }
  }

  test("BMP round trip: exact pixels + imageio oracle + PSNR = inf") {
    val phash = 0x1234abcd5678L
    val rgb = Bmp.pixels(phash, 13, 7) // odd width exercises row padding
    val bmp = Bmp.encode(rgb, 13, 7)
    val (back, w, h) = Bmp.decode(bmp)
    assert(w === 13 && h === 7)
    assert(back.toSeq === rgb.toSeq)
    assert(ImageOps.psnr(bmp, bmp).isPosInfinity)
    // javax.imageio as independent decode oracle
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth === 13 && img.getHeight === 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val px = img.getRGB(x, y)
      val i = (y * 13 + x) * 3
      assert(((px >> 16) & 0xff) === (rgb(i) & 0xff), s"R($x,$y)")
      assert(((px >> 8) & 0xff) === (rgb(i + 1) & 0xff), s"G($x,$y)")
      assert((px & 0xff) === (rgb(i + 2) & 0xff), s"B($x,$y)")
    }
  }

  test("image payload survives the spatial pipeline byte-exact (input_hint invariant)") {
    val g = graft.synth.Synth.gridSize(spark, sf)
    val images = graft.synth.Synth.images(spark, sf, g, withBytes = true).limit(50).cache()
    val tagged = graft.synth.Synth.withGeotag(images, g)
    // shuffle the binary through a spatial join + repartition
    val (_, _, wayData) = Pipeline.prepared(spark, sf)
    val streets = wayData.filter(col("way_id") < 2000000L)
    val out = graft.ops.SpatialOps.knnWays(tagged, streets, k = 1)
      .repartition(7)
      .select("image_id", "caption", "phash", "w", "h", "bytes")
      .as[(String, String, Long, Int, Int, Array[Byte])].collect()
    val orig = images.select("image_id", "caption", "phash", "w", "h", "bytes")
      .as[(String, String, Long, Int, Int, Array[Byte])].collect()
      .map(r => r._1 -> r).toMap
    assert(out.length === 50)
    val fmts = images.select("image_id", "fmt").as[(String, String)].collect().toMap
    out.foreach { case r @ (id, cap, ph, w, h, bytes) =>
      val o = orig(id)
      val fmt = fmts(id)
      assert(cap === o._2, "caption equality")
      // bytes survive the shuffle unchanged, whatever the codec
      assert(bytes.toSeq === o._6.toSeq, s"$id ($fmt) payload bytes")
      // decoded-pixel allclose vs the synthesis-time source pattern:
      // bit-exact for lossless bmp/png (PSNR = inf), >= 40 dB for jpeg
      val (rgb, dw, dh) = graft.synth.Codec.decodeAny(fmt, bytes).get
      assert(dw === w && dh === h)
      val src = graft.synth.Codec.sourcePixels(fmt, ph, w, h)
      if (fmt == "jpeg")
        assert(graft.synth.Codec.psnrRgb(src, rgb) >= 40.0, s"$id jpeg PSNR")
      else
        assert(rgb.toSeq === src.toSeq, s"$id ($fmt) lossless pixels")
    }
  }

  test("decodeFeatures: means match hand-computed pixels for all 3 codecs; unknown fmt is stubbed") {
    import graft.synth.Codec
    val rgb = Bmp.pixels(42L, 8, 8)
    val smooth = Codec.smoothPixels(42L, 8, 8)
    val df = Seq(
      ("a", "bmp", 8, 8, Bmp.encode(rgb, 8, 8), 42L),
      ("p", "png", 8, 8, Codec.encodePng(rgb, 8, 8), 42L),
      ("j", "jpeg", 8, 8, Codec.encodeJpeg(smooth, 8, 8), 42L),
      ("b", "webp", 8, 8, Array[Byte](1, 2, 3), 99L))
      .toDF("image_id", "fmt", "w", "h", "bytes", "phash")
    val feats = ImageOps.decodeFeatures(spark, df)
      .select("image_id", "mean_r", "decode_ok")
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def meanR(px: Array[Byte]) = px.grouped(3).map(p => (p(0) & 0xff).toDouble).sum / 64
    assert(math.abs(feats("a")._1 - meanR(rgb)) < 1e-9)
    assert(feats("a")._2 === true)
    // png is lossless: mean must equal the source pixels' mean exactly
    assert(math.abs(feats("p")._1 - meanR(rgb)) < 1e-9)
    assert(feats("p")._2 === true)
    // jpeg q=0.95 on a smooth gradient: mean within a few levels of source
    assert(math.abs(feats("j")._1 - meanR(smooth)) < 4.0)
    assert(feats("j")._2 === true)
    assert(feats("b")._2 === false)
  }

  test("chunk: windows cover every token with exact overlap; short tail emitted; tiny doc = one chunk") {
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks(10)),   // 10 tokens, size 8 / overlap 3 -> chunks at 0,5
                 (2L, toks(3)),    // shorter than overlap -> exactly one chunk
                 (3L, toks(8)),    // == size -> one chunk
                 (4L, toks(14)))   // chunks at 0,5,10 (tail len 4)
      .toDF("doc_id", "text")
    val out = TextOps.chunk(df, chunkSize = 8, overlap = 3)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L).map(_._2).toSeq == Seq(0, 1))
    assert(out(1L)(0)._3 === toks(8))
    assert(out(1L)(1)._3 === (6 to 10).map(i => s"t$i").mkString(" "))
    assert(out(1L)(1)._4 === 5)
    assert(out(2L).length === 1 && out(2L)(0)._3 === toks(3) && out(2L)(0)._4 === 3)
    assert(out(3L).length === 1 && out(3L)(0)._4 === 8)
    assert(out(4L).map(_._2).toSeq == Seq(0, 1, 2))
    assert(out(4L)(2)._3 === (11 to 14).map(i => s"t$i").mkString(" "))
    assert(out(4L)(2)._4 === 4)
    // reconstruction: stripping the overlap from every chunk after the
    // first rebuilds the document exactly — no token lost or duplicated
    val rebuilt = out(4L).zipWithIndex.map { case ((_, _, text, _), i) =>
      val ws = text.split(" ")
      if (i == 0) ws else ws.drop(3)
    }.flatten.mkString(" ")
    assert(rebuilt === toks(14))
  }

  test("redact: URLs, emails, and long digit runs replaced; counts exact; clean text untouched") {
    val df = Seq(
      (1L, "see https://a.b/c?x=123456789 or http://d.e f"),
      (2L, "mail a.b-c%d@mail.example.org now"),
      (3L, "call 12345678 not 123456 end"),
      (4L, "plain text with no pii at all"))
      .toDF("doc_id", "text")
    val out = TextOps.redact(df).select("doc_id", "redacted", "n_redactions")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === "see <URL> or <URL> f")
    assert(out(1L)._2 === 2)
    assert(out(2L)._1 === "mail <EMAIL> now")
    assert(out(2L)._2 === 1)
    assert(out(3L)._1 === "call <NUM> not 123456 end") // 6 digits stays
    assert(out(3L)._2 === 1)
    assert(out(4L)._1 === "plain text with no pii at all")
    assert(out(4L)._2 === 0)
  }

  test("Codec: png round-trips bit-exact; jpeg smooth-gradient PSNR clears 40 dB at all synth sizes") {
    import graft.synth.Codec
    for (w <- 8 to 15; h <- Seq(8, 11, 15)) {
      val ph = w * 1000L + h * 7L + 0x9e3779b9L
      val rgb = Bmp.pixels(ph, w, h)
      val (back, dw, dh) = Codec.decode(Codec.encodePng(rgb, w, h))
      assert(dw === w && dh === h)
      assert(back.toSeq === rgb.toSeq, s"png roundtrip $w x $h")
      val smooth = Codec.smoothPixels(ph, w, h)
      val (jback, jw, jh) = Codec.decode(Codec.encodeJpeg(smooth, w, h))
      assert(jw === w && jh === h)
      val p = Codec.psnrRgb(smooth, jback)
      assert(p >= 40.0, f"jpeg PSNR $p%.1f dB at $w x $h (contract: >= 40)")
    }
  }

  test("dupSpans: overlapping, disjoint and within-doc duplicated runs union exactly") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared10 = words("s", 10)            // 10-token run → 3 dup 8-gram starts
    val shared8 = words("p", 8)              // exactly one dup 8-gram
    val docs = Seq(
      // partial overlap: starts {0,1,2}, union [0,9] = 10 covered
      (1L, s"$shared10 ${words("a", 20)}"),
      (2L, s"${words("b", 5)} $shared10 ${words("c", 15)}"),
      // prefix-only share: 1 start, 8 covered
      (3L, s"$shared8 ${words("d", 12)}"),
      (4L, s"$shared8 ${words("e", 12)}"),
      // WITHIN-doc repeat: same 8-gram at starts 0 and 11 → 16 covered
      (5L, s"$shared8 ${words("f", 3)} $shared8 ${words("g", 4)}"),
      // too short for any 8-gram
      (6L, words("h", 5)),
      // no duplicated grams at all
      (7L, words("i", 30))
    ).toDF("doc_id", "text")
    val got = TextOps.dupSpans(docs, n = 8).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 30L, 3L, 10L, false),
      (2L, 30L, 3L, 10L, false),
      (3L, 20L, 1L, 8L, false),
      (4L, 20L, 1L, 8L, false),
      (5L, 23L, 2L, 16L, true),
      (6L, 5L, 0L, 0L, false),
      (7L, 30L, 0L, 0L, false)))
  }

  test("hardNegatives: every mined negative has a different label; top-1 matches serial argmax") {
    val emb = graft.synth.Synth.embeddings(spark, sf)
    val got = SimOps.hardNegatives(emb, col("vec_id") % 100 === 0, k = 3)
    assert(got.filter(col("q_label") === col("neighbor_label")).count() == 0L)
    // serial re-derivation of the top-1 per anchor
    val rows = emb.select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
    def cos9(a: Seq[Float], b: Seq[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9)
    }
    val expected = rows.filter(_._1 % 100 == 0).map { case (qid, qe, ql) =>
      val best = rows.filter(_._3 != ql)
        .map { case (id, e, l) => (cos9(qe, e), id, l) }
        .sortBy { case (c, id, _) => (-c, id) }.head
      (qid, best._2)
    }.toMap
    val top1 = got.filter(col("rk") === 1)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toMap
    assert(top1 === expected)
  }

  test("bigramPerplexity matches a serial add-one-smoothed bigram LM") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "zz"),          // single token: no pairs
      (4L, "the cat sat on the mat")  // exact dup of 1 -> same score
    ).toDF("doc_id", "text")
    val got = TextOps.bigramPerplexity(docs, meanNatsMin = 3.4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // serial model
    val corpus = Seq("the cat sat on the mat", "the cat ran", "zz",
      "the cat sat on the mat").map(_.split(" ").toSeq)
    val uni = corpus.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = uni.size.toLong
    val bi = corpus.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def score(toks: Seq[String]): (Long, Long) = {
      val lp9s = toks.zip(toks.tail).map { p =>
        math.round(math.log((bi(p) + 1).toDouble / (uni(p._1) + vocab).toDouble) * 1e9)
      }
      (lp9s.size.toLong, lp9s.sum)
    }
    val exp = corpus.zipWithIndex.map { case (t, i) =>
      val (np, lp) = if (t.size >= 2) score(t) else (0L, 0L)
      (i + 1L, t.size.toLong, np, lp, lp >= -3400000000L * np)
    }
    assert(got === exp)
    // the duplicate doc scores identically
    assert(got(0)._4 === got(3)._4)
  }

  test("dupSpans is partition-invariant over the real documents table") {
    val docs = graft.synth.Synth.documents(spark, sf)
    val a = TextOps.dupSpans(docs.repartition(1), 8).orderBy("doc_id").collect().toSeq
    val b = TextOps.dupSpans(docs.repartition(32), 8).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  // serial reference BPE trainer: Sennrich-style pair counting over a word-
  // frequency dict (overlapping pairs counted) + greedy leftmost
  // NON-overlapping apply — an implementation independent of both the Spark
  // fold and the DuckDB recursive CTE
  private def refBpe(words: Map[String, Long], nMerges: Int)
      : (Seq[(Int, String, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, (Long, Vector[String])] =
      words.map { case (w, n) => w -> (n, w.map(_.toString).toVector) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (n, syms) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
        merges += ((r, a, b, a + b, cnt))
        vocab = vocab.map { case (w, (n, syms)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (n, out.result())
        }
      }
    }
    (merges.toSeq, vocab.view.mapValues(_._2.toSeq).toMap)
  }

  test("bpeTrain matches the serial reference, incl. greedy overlap runs ('aaaa' -> aa aa)") {
    // run-heavy words are the classic apply trap: overlapping pair COUNTS
    // ('aaa' has (a,a) twice) but non-overlapping APPLICATION
    val raw = Seq("aaaa aaaa aaa ab", "aaaa abab abab x", "banana banana aaa",
      "ab ab ab aaaa")
    val docs = raw.zipWithIndex
      .map { case (t, i) => (i.toLong, "en", "src0", t) }
      .toDF("doc_id", "lang", "source", "text")
    val wordCounts = raw.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (expMerges, expVocab) = refBpe(wordCounts, 5)
    val (gotMergesDf, gotVocabDf) = TextOps.bpeTrain(docs, 5)
    val gotMerges = gotMergesDf.orderBy("rk")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(gotMerges === expMerges)
    val gotVocab = gotVocabDf.select("word", "toks").as[(String, String)]
      .collect().toMap
    assert(gotVocab === expVocab.map { case (w, s) => w -> s.mkString(" ") })
    // the trap case explicitly after ONE merge (round 1 learns (a,a) -> aa;
    // later rounds legitimately merge (aa,aa) too): 4 a's -> two 'aa'
    // (NOT 'aa a a'), 3 a's -> 'aa a' (NOT 'a aa')
    val vocab1 = TextOps.bpeTrain(docs, 1)._2
      .select("word", "toks").as[(String, String)].collect().toMap
    assert(vocab1("aaaa") === "aa aa")
    assert(vocab1("aaa") === "aa a")
    assert(vocab1("banana") === "b a n a n a")
  }

  test("bpeTrain is partition-invariant on the real documents table") {
    val docs = graft.synth.Synth.documents(spark, sf)
    val (m1, v1) = TextOps.bpeTrain(docs.repartition(1), 4)
    val (m32, v32) = TextOps.bpeTrain(docs.repartition(32), 4)
    assert(m1.orderBy("rk").collect().toSeq === m32.orderBy("rk").collect().toSeq)
    assert(v1.orderBy("word").collect().toSeq === v32.orderBy("word").collect().toSeq)
  }

  test("semDedup: one keeper per duplicate group, lowest-centroid-cos survivor, brute-force parity") {
    val base = graft.synth.Synth.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        concat(array((element_at(col("embedding"), 1) * lit(0.5f)).cast("float")),
          slice(col("embedding"), 2, 1000000)).as("embedding"))
    val all = base.unionByName(planted)
    val got = SimOps.semDedup(all, nlist = 16, cosMin = 0.9)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq

    // serial brute force: assignment, in-cluster pairs, union-find, keeper.
    // cos9 mirrors CosineSim + Spark round EXACTLY (dot/(sqrt(na)·sqrt(nb)),
    // then HALF_UP away from zero) — sqrt(na·nb) or math.round would differ
    // by 1 ulp / on .5 boundaries and flake near thresholds.
    val vecs = all.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos9(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val c = if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
      BigDecimal(c * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val cents = vecs.filter(_._1 < 16).toSeq.sortBy(_._1)
    val assign = vecs.map { case (id, e) =>
      val (cid, c9) = cents.map { case (cid, ce) => (cid, cos9(e, ce)) }
        .minBy { case (cid, c9) => (-c9, cid) }
      id -> (cid, c9)
    }
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- ids; j <- ids if i < j)
      if (assign(i)._1 == assign(j)._1 && cos9(vecs(i), vecs(j)) >= 900000000L) {
        val (ri, rj) = (find(i), find(j)); if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    val expComp = ids.map(i => i -> find(i)).toMap
    val expKeep = ids.groupBy(expComp).map { case (_, members) =>
      members.minBy(m => (assign(m)._2, m))
    }.toSet

    assert(got.map(_._1).toSet === ids.toSet)
    got.foreach { case (id, listId, comp, c9, keep) =>
      assert(listId === assign(id)._1, s"list of $id")
      assert(c9 === assign(id)._2, s"cent_cos9 of $id")
      assert(comp === expComp(id), s"component of $id")
      assert(keep === expKeep.contains(id), s"keep of $id")
    }
    // the planted twins actually exercise the path: at least one duplicate
    // group exists and drops exactly (n - #components) rows
    assert(got.count(!_._5) === ids.size - expKeep.size)
    assert(got.exists(!_._5))
  }

  test("shuffleOrder: bijective over the FULL domain, matches in-JVM Feistel, non-trivial") {
    // halfBits = 5 -> domain [0, 1024): enumerate it all, perm must be a
    // permutation (every output hit exactly once)
    val hb = 5; val m = 1L << hb
    val ids = (0L until m * m).toDF("doc_id")
    val got = TextOps.shuffleOrder(ids, halfBits = hb, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === (0L until m * m).toSet)
    assert(got.values.toSet === (0L until m * m).toSet, "perm is not a bijection")
    // in-JVM reference of the same 3 rounds
    def ref(id: Long): Long = {
      var l = id / m; var r = id % m
      for (rd <- 1 to 3) {
        val f = java.lang.Math.floorMod((r + rd * 40503L) * 2654435761L, m)
        val nl = r; val nr = java.lang.Math.floorMod(l + f, m)
        l = nl; r = nr
      }
      l * m + r
    }
    (0L until m * m).foreach(id => assert(got(id) === ref(id), s"id $id"))
    // the permutation genuinely scrambles: most ids move, and sorted-by-perm
    // order breaks input adjacency for most neighbors
    assert((0L until m * m).count(id => got(id) == id) < 16)
    val order = (0L until m * m).sortBy(got)
    val adjacentKept = order.sliding(2).count { case Seq(a, b) => b == a + 1; case _ => false }
    assert(adjacentKept < (m * m / 16), s"$adjacentKept adjacent pairs survived")
  }
}
