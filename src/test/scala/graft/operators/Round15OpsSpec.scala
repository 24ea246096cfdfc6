package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, SparkTestSession}

/** Behavior pins for the round-15 operator tranche: cohort retention,
  * ordered funnels, triangle counting, temperature sampling, n-gram
  * novelty, and positive-pair mining. The DuckDB oracles check
  * engine-parity; these pin the SEMANTICS on hand-built inputs where
  * the expected answer is known by construction.
  */
class Round15OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def docs = Engine.table(spark, SparkTestSession.sfDir, "documents")
  private def events = Engine.table(spark, SparkTestSession.sfDir, "events")
  private def embeddings = Engine.table(spark, SparkTestSession.sfDir, "embeddings")

  test("retention: offset-0 row per cohort equals cohort size; offsets non-negative") {
    val r = Behavior.weeklyRetention(events).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getAs[Long]("week_offset") >= 0))
    val cohortSizes = events.groupBy("user_id").agg(min("ts").as("f"))
      .select(date_trunc("week", col("f")).cast("date").as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getAs[java.sql.Date]("w").toString, x.getAs[Long]("n"))).toMap
    val offset0 = r.filter(_.getAs[Long]("week_offset") == 0L)
      .map(x => (x.getAs[java.sql.Date]("cohort_week").toString, x.getAs[Long]("n_users"))).toMap
    // every user is active in their first week by definition
    assert(offset0 == cohortSizes)
  }

  test("funnel: greedy-chain semantics on a hand-built event log") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // u1 converts fully in order; u2 views BEFORE signup (no chain);
    // u3 purchases outside the 30-day window; u4 signup only.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-02 00:00:00"), "view"),
      (1L, ts("2024-01-03 00:00:00"), "purchase"),
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-02 00:00:00"), "signup"),
      (3L, ts("2024-01-01 00:00:00"), "signup"),
      (3L, ts("2024-01-02 00:00:00"), "view"),
      (3L, ts("2024-03-01 00:00:00"), "purchase"),
      (4L, ts("2024-01-01 00:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val f = Behavior.funnel(ev, Seq("signup", "view", "purchase"), windowDays = 30)
      .orderBy("step_idx").collect()
    assert(f.map(_.getAs[Long]("n_users")).toSeq == Seq(4L, 2L, 1L))
    // counts are monotone non-increasing by construction
    val ns = f.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("funnel: greedy min does not block a later completing chain") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // earliest view (day 2) precedes the purchase (day 5): greedy chain
    // signup(1) -> view(2) -> purchase(5) completes even though another
    // view (day 6) comes after the purchase.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-02 00:00:00"), "view"),
      (1L, ts("2024-01-06 00:00:00"), "view"),
      (1L, ts("2024-01-05 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val f = Behavior.funnel(ev, Seq("signup", "view", "purchase"), 30)
      .orderBy("step_idx").collect()
    assert(f.map(_.getAs[Long]("n_users")).toSeq == Seq(1L, 1L, 1L))
  }

  test("triangles: K4 plus a pendant edge — 3 per K4 node, pendant in none") {
    import spark.implicits._
    // K4 on {0,1,2,3}: C(4,3)=4 triangles, each node in 3. Node 9 hangs
    // off node 0 by one edge — never in a triangle. Edges given in
    // mixed orientation with a duplicate and a self-loop to exercise
    // canonicalization.
    val edges = Seq(
      (0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (1L, 2L), (3L, 1L), (2L, 3L),
      (0L, 9L), (5L, 5L)
    ).toDF("u", "v")
    val got = Triangles.perNode(edges).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("n_tri"))).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("temperature sampling flattens the head: en's share drops toward sqrt-proportional") {
    val total = docs.count()
    val enRaw = docs.filter(col("lang") === "en").count().toDouble / total
    val sample = TextAnalysis.temperatureSample(docs, "lang", totalN = 200L)
    val rows = sample.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("rn") <= r.getAs[Long]("quota")))
    val enShare = rows.count(_.getAs[String]("source") == "en").toDouble / rows.length
    // α=1/2 pulls the head language's share strictly below its raw share
    assert(enShare < enRaw, s"en sampled $enShare vs raw $enRaw")
    // deterministic: a second run draws the identical set
    val again = TextAnalysis.temperatureSample(docs, "lang", totalN = 200L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("ngram novelty: a verbatim reference copy scores 0, alien text 1000") {
    import spark.implicits._
    val ref = docs.filter(col("doc_id") >= 100).select("doc_id", "text")
    val someRefText = ref.orderBy("doc_id").select("text").head().getString(0)
    val alien = (1 to 30).map(i => s"zzq$i").mkString(" ")
    val cand = Seq((1L, someRefText), (2L, alien)).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(cand, ref, n = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("novelty_millis"))).toMap
    assert(got(1L) == 0L, "verbatim copy of a reference doc must score 0")
    assert(got(2L) == 1000L, "text sharing no 5-gram with the reference must score 1000")
  }

  test("sessionize: strictly-exceeds boundary, tie-stable ordering, floor-diff duration") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // gaps: exactly 30 min (same session), 30 min + 1 s (new session);
    // two events at the identical ts (tie broken by event_id).
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-01 00:30:00")), // gap == 30min -> SAME session
      (1L, 12L, ts("2024-01-01 01:00:01")), // gap 30min+1s -> NEW session
      (1L, 13L, ts("2024-01-01 01:00:01")), // tie ts -> same session
      (2L, 20L, ts("2024-01-01 00:00:00.400")),
      (2L, 21L, ts("2024-01-01 00:00:01.600"))  // duration floor(1.6)-floor(0.4)=1
    ).toDF("user_id", "event_id", "ts")
    val got = Behavior.sessionize(ev, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    val u1 = got.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"))).toSeq ==
      Seq((1L, 2L), (2L, 2L)))
    val u2 = got.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Long]("duration_secs") == 1L)
  }

  test("token budget: crossing doc included, next excluded; pre-prune equals naive window") {
    import spark.implicits._
    // group g: quality order is d1 (q=1000, 900 tok), d2 (q=1000, 900),
    // d3 (q=500, 900): budget 2000 -> d1 (before=0), d2 (before=900),
    // d3 (before=1800 < 2000, CROSSES and is included); d4 excluded.
    def mk(id: Long, nUniq: Int, nTot: Int): (Long, String, String) = {
      val toks = (1 to nUniq).map(i => s"w${id}_$i") ++
        Seq.fill(nTot - nUniq)(s"w${id}_1")
      (id, "g", toks.mkString(" "))
    }
    val docs = Seq(mk(1, 900, 900), mk(2, 900, 900), mk(3, 450, 900),
      mk(4, 100, 900)).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tokenBudgetSelect(docs, "lang", budgetTokens = 2000L)
      .orderBy("rn").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    // parity with the corpus-scale draw on real data: the bounded-heap
    // survivors yield the same set as the naive full window
    val real = Engine.table(spark, SparkTestSession.sfDir, "documents")
    val fast = TextAnalysis.tokenBudgetSelect(real, "lang", 2000L)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[Long]("doc_id"))).toSet
    import org.apache.spark.sql.expressions.Window
    val ws = split(col("text"), " ")
    val w = Window.partitionBy("lang").orderBy(desc("quality"), col("doc_id"))
    val naive = real
      .select(col("lang"), col("doc_id"), size(ws).cast("long").as("n_tok"),
        floor(size(array_distinct(ws)) * 1000.0 / size(ws)).cast("long").as("quality"))
      .filter(col("n_tok") > 0)
      .withColumn("cum_before",
        sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - col("n_tok"))
      .filter(col("cum_before") < 2000)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    assert(fast == naive)
  }

  test("image near-dup: planted perturbations pair up; banding equals all-pairs") {
    import spark.implicits._
    val base = docs.filter(col("doc_id") < 60).select("doc_id", "text")
    val pert = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(lit("Z"), expr("substr(text, 2)")).as("text"))
    val bmps = Multimodal.synthesizeBmp(spark, base.union(pert), width = 16)
    val banded = Multimodal.imageNearDupPairs(spark, bmps, maxDist = 6)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // every planted single-byte perturbation is a near-dup of its source
    (0L until 10L).foreach(i => assert(banded.contains((i, i + 30000)),
      s"planted pair ($i, ${i + 30000}) missing"))
    // pigeonhole banding is exact: equals the all-pairs hamming filter
    val h = Multimodal.imageAHash(spark, bmps).toDF()
    val all = h.as("x").join(h.as("y"),
        col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
        (bit_count(col("x.h_hi").bitwiseXOR(col("y.h_hi"))) +
          bit_count(col("x.h_lo").bitwiseXOR(col("y.h_lo")))).as("d"))
      .filter(col("d") <= 6)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(banded == all)
  }

  test("transitions never cross a session boundary; shares sum to ~1000 per from-type") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // u1: A->B inside one session, then a >12h gap: B->C must NOT count.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, 2L, ts("2024-01-01 00:10:00"), "B"),
      (1L, 3L, ts("2024-01-02 00:00:00"), "C"),
      (1L, 4L, ts("2024-01-02 00:05:00"), "A")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Behavior.transitions(ev, gapMinutes = 720).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n"))).toMap
    assert(got == Map(("A", "B") -> 1L, ("C", "A") -> 1L))
    val real = Behavior.transitions(events, gapMinutes = 720)
    val sums = real.groupBy("from_type")
      .agg(sum("share_millis").as("s")).collect().map(_.getAs[Long]("s"))
    // floors lose at most (#to_types - 1) millis per from-type
    sums.foreach(s => assert(s >= 990 && s <= 1000, s.toString))
  }

  test("mmr trades relevance for diversity on a planted geometry") {
    import spark.implicits._
    val q = Seq((99L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Seq(1.0f, 0.0f)),      // r=1000 — picked first
      (2L, Seq(0.95f, 0.05f)),    // r≈999 but redundant with 1
      (3L, Seq(0.5f, 0.866f))     // r=500, diverse
    ).toDF("vec_id", "embedding")
    // diversity-heavy λ: the diverse low-relevance vector beats the
    // redundant high-relevance one on round 2
    val got = Similarity.mmrSelect(cands, q, k = 3, lambdaMillis = 300L)
      .orderBy("sel_rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == Seq(1L, 3L, 2L))
    // relevance-heavy λ flips rounds 2 and 3
    val rel = Similarity.mmrSelect(cands, q, k = 3, lambdaMillis = 900L)
      .orderBy("sel_rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(rel == Seq(1L, 2L, 3L))
  }

  test("k-center picks the farthest-first order on a planted geometry") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),   // seed (min id)
      // near the seed but outside the milli-quantization (cos ≈ 0.989 →
      // d = 11; a 0.01 offset would round to d = 0 and tie with the
      // selected points' self-distance) — picked LAST
      (1L, Seq(1.0f, 0.15f)),
      (2L, Seq(0.0f, 1.0f)),   // orthogonal
      (3L, Seq(-1.0f, 0.0f))   // antipodal — farthest, picked 2nd
    ).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(vecs, k = 4)
      .orderBy("sel_rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == Seq(0L, 3L, 2L, 1L))
  }

  test("knn graph probing all cells equals brute force for every corpus vector") {
    val centroids = embeddings.filter(col("vec_id") < 8)
    val graph = Similarity.knnGraph(embeddings, centroids, k = 5, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val brute = Similarity.bruteForceTopK(embeddings, embeddings, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(graph == brute)
    // every vector is a node in the graph
    val n = embeddings.count()
    assert(graph.map(_._1).size == n)
  }

  test("skipgram: saturated t disables subsampling; pairs match hand-rolled windows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    // t huge -> every threshold saturates at ffffffff -> everything kept
    val got = TextAnalysis.skipgramPairs(df, window = 2, t = 1e9, topK = 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("cnt"))).toMap
    val want = Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L,
      ("a", "c") -> 1L, ("b", "d") -> 1L, ("x", "y") -> 1L)
    assert(got == want)
  }

  test("skipgram subsampling shrinks the pair mass as t decreases") {
    def mass(t: Double): Long =
      TextAnalysis.skipgramPairs(docs, window = 2, t = t, topK = 1000000)
        .agg(sum("cnt")).head().getLong(0)
    val loose = mass(1e9); val tight = mass(1e-4)
    assert(tight < loose, s"t=1e-4 mass $tight !< saturated mass $loose")
    assert(tight > 0, "subsampling must not empty the corpus")
  }

  test("positive pairs: every neighbor shares the anchor's label; ranks dense from 1") {
    val anchors = embeddings.filter(col("vec_id") < 5)
    val labels = embeddings.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val got = Similarity.positivePairs(embeddings, anchors, k = 10).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(q != n)
      assert(labels(q) == labels(n), s"neighbor $n label != anchor $q label")
    }
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }
}
