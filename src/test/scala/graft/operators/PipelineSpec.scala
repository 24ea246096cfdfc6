package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, SparkTestSession}

/** Recall/behavior checks for the pipeline operators that have no DuckDB
  * oracle (hash families are engine-specific) or are deliberately
  * approximate (IVF).
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def docs = Engine.table(spark, SparkTestSession.sfDir, "documents")
  private def embeddings = Engine.table(spark, SparkTestSession.sfDir, "embeddings")

  test("minhash-LSH finds exactly the exact-Jaccard>=0.8 pairs") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.8, maxShingleDf = Long.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, threshold = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact) // banding recall ~1 at J>=0.9; verification kills FPs
  }

  test("prefix filter is lossless: thresholded pairs equal the full-index reference") {
    // t ≈ 0 makes the prefix the whole sorted set (ceil(n·ε) = 1 → len = n),
    // i.e. the pre-PPJoin full inverted index; its verified output filtered
    // at 0.5 is the exact reference the prefix-filtered run must equal.
    val reference = Dedup.jaccardPairs(docs, threshold = 1e-9,
        maxShingleDf = Long.MaxValue)
      .filter(col("jaccard") >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = Dedup.jaccardPairs(docs, threshold = 0.5,
        maxShingleDf = Long.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reference.nonEmpty)
    assert(filtered == reference)
  }

  test("simhash candidates cover the exact near-dup pairs (recall)") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.8, maxShingleDf = Long.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, maxDist = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.85, s"simhash recall $recall over ${exact.size} exact pairs")
  }

  test("IVF top-k recalls most of the brute-force top-k") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val brute = Similarity.bruteForceTopK(embeddings, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embeddings, queries, centroids, k = 10, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size == 50)
    val recall = brute.count(ivf.contains).toDouble / brute.size
    // nProbe=4 of 16 arbitrary centroids over uniform random vectors —
    // recall well above the 4/16 random-scan baseline proves the probe
    // ordering works; exact recall rises with nProbe.
    assert(recall >= 0.3, s"IVF recall $recall")
    assert(ivf.nonEmpty && ivf.forall { case (q, n) => q != n })
  }

  test("containment pairs: excerpts hit 1.0 where jaccard stays low; containment >= jaccard always") {
    import spark.implicits._
    val base = docs.filter(col("doc_id") < 40).select("doc_id", "text")
    val longDocs = base.filter(size(split(col("text"), " ")) >= 60)
    val nPlanted = longDocs.count()
    assert(nPlanted >= 5, s"plant needs long docs, found $nPlanted")
    val exc = longDocs
      .select((col("doc_id") + 30000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text"))
    val pairs = Dedup.containmentPairs(base.union(exc), threshold = 0.9,
      maxShingleDf = Long.MaxValue).collect()
    // every planted excerpt pairs with its source at containment 1.0
    val planted = pairs.filter(r => r.getAs[Long]("b") == r.getAs[Long]("a") + 30000)
    assert(planted.length == nPlanted)
    planted.foreach { r =>
      assert(r.getAs[Double]("containment") == 1.0)
      // 12-token excerpt of a >=60-token source: jaccard <= 10/58
      assert(r.getAs[Double]("jaccard") < 0.2, r.toString)
    }
    pairs.foreach(r => assert(
      r.getAs[Double]("containment") >= r.getAs[Double]("jaccard") - 1e-12))
    // threshold honored on the asymmetric measure
    assert(pairs.forall(_.getAs[Double]("containment") >= 0.9))
  }

  test("hard negatives: never the anchor's label, and exactly brute-force minus same-label rows") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val labels = embeddings.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hn = Similarity.hardNegatives(embeddings, queries, k = 10).collect()
    assert(hn.length == 50)
    hn.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(labels(q) != labels(n), s"same-label pair ($q, $n)")
    }
    // ranks are contiguous 1..k per anchor
    hn.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
    }
    // parity: filtering brute-force's FULL ranking to label mismatches
    // and re-ranking reproduces the mined set exactly
    val brute = Similarity.bruteForceTopK(embeddings, queries, k = embeddings.count().toInt)
      .collect()
      .filter(r => labels(r.getAs[Long]("query_id")) != labels(r.getAs[Long]("neighbor_id")))
      .groupBy(_.getAs[Long]("query_id"))
      .flatMap { case (_, g) =>
        g.sortBy(r => (-r.getAs[Double]("sim"), r.getAs[Long]("neighbor_id")))
          .take(10).toSeq }
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val mined = hn.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(mined == brute)
  }

  test("cross-source overlap: hand-computed shingle matrix") {
    import spark.implicits._
    // 2-gram sets: A {a b, b c, c d}, B {b c, c d, d e}, C {x y}.
    val docs = Seq(("A", "a b c d"), ("B", "b c d e"), ("C", "x y"))
      .toDF("source", "text")
    val out = graft.operators.Dedup.crossSourceOverlap(docs, n = 2)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // A∩B = {b c, c d} = 2; union = 4 -> 500 per-mille. C shares nothing
    // with either — absent, not zero rows.
    assert(out == Seq(("A", "B", 2L, 500L)))
    // Duplicate docs inside one source do not inflate the distinct sets.
    val dup = Seq(("A", "a b"), ("A", "a b"), ("B", "a b"))
      .toDF("source", "text")
    val o2 = graft.operators.Dedup.crossSourceOverlap(dup, n = 2).collect()
    assert(o2.length == 1 && o2.head.getLong(2) == 1L &&
      o2.head.getLong(3) == 1000L)
  }

  test("shingle dup ratio: hand-computed on a three-doc corpus") {
    import spark.implicits._
    // 2-gram sets: A {a b, b c}, B {b c, c d}, C {x y}; only "b c" is
    // shared (2 docs).
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.shingleDupRatio(docs, n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 500L), (2L, 2L, 1L, 500L),
      (3L, 1L, 0L, 0L)))
    // Repeating a shingle INSIDE one document must not count as shared.
    val self = Seq((1L, "a b a b"), (2L, "z z"))
      .toDF("doc_id", "text")
    val o2 = graft.operators.Dedup.shingleDupRatio(self, n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(o2.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("weighted sampling: clamped bounds, determinism, monotone in weight") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, "d")).toDF("doc_id", "text")
    val all = graft.operators.TextAnalysis.sampleByWeight(docs, lit(2.0))
    assert(all.count() == 200) // w >= 1 keeps everything (clamped)
    val none = graft.operators.TextAnalysis.sampleByWeight(docs, lit(-0.5))
    assert(none.count() == 0)  // w <= 0 keeps nothing (clamped)
    def ids(w: Double): Set[Long] =
      graft.operators.TextAnalysis.sampleByWeight(docs, lit(w))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(0.3)
    assert(a == ids(0.3))            // pure function of the id: rerun-stable
    assert(a.subsetOf(ids(0.6)))     // monotone: raising w never drops a doc
    val n = a.size
    assert(n > 30 && n < 90, s"w=0.3 kept $n of 200") // roughly proportional
  }

  test("corpus divergence: hand-computed KL on a two-group corpus") {
    import spark.implicits._
    // A: {x:3, y:1}, B: {x:1, y:3}; pooled q = (0.5, 0.5).
    // KL = 0.75 ln 1.5 + 0.25 ln 0.5 = 0.1308122... for both groups.
    val docs = Seq(("A", "x x x y"), ("B", "x y y y")).toDF("source", "text")
    val out = TextAnalysis.corpusDivergence(docs, topK = 2)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 4L, 130812L), ("B", 4L, 130812L)))
    // topK = 1: vocab = {x} (count tie broken by token asc), y becomes
    // the OOV bucket — same mass split here, so the same KL.
    val oov = TextAnalysis.corpusDivergence(docs, topK = 1)
      .orderBy("grp").collect().map(_.getLong(2)).toSeq
    assert(oov == Seq(130812L, 130812L))
    // A group missing a vocab token contributes a zero term, not NaN.
    val docs2 = Seq(("A", "x x"), ("B", "x y")).toDF("source", "text")
    val out2 = TextAnalysis.corpusDivergence(docs2, topK = 5)
      .orderBy("grp").collect().map(_.getLong(2)).toSeq
    // A: p_x=1, q_x=0.75 -> ln(4/3)=0.287682; B: .5 ln(2/3)+.5 ln 2
    //   = 0.143841.
    assert(out2 == Seq(287682L, 143841L))
  }

  test("gopher rules: hand-built docs trip each flag independently") {
    import spark.implicits._
    // The synthetic corpus has no lines/bullets/symbols, so the
    // line-level and symbol rules are pinned here on planted text.
    val good = (Seq.fill(20)("the of and that") :+ "have with").mkString(" ")
    val docs = Seq(
      (1L, good),                                    // passes everything
      (2L, "the of and"),                            // too short
      (3L, good + " ##########"),                    // symbol ratio > 1/10
      (4L, (1 to 10).map(i => s"- bullet $i the of and that have with " +
        "w w w w w w w w w w w w w w w w w w w w w w w w w w w w w w w w " +
        "w w w w w w").mkString("\n")),              // every line bulleted
      (5L, good + "\n" + "end..." + "\n" + "end2..." + "\n" + "x")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("f_word_count"),
        r.getAs[Boolean]("f_symbol"), r.getAs[Boolean]("f_bullet"),
        r.getAs[Boolean]("f_ellipsis"), r.getAs[Boolean]("keep"))).toSeq
    assert(out(0) == ((1L, true, true, true, true, true)))
    assert(out(1)._2 == false && out(1)._6 == false)       // word count
    assert(out(2)._3 == false && out(2)._6 == false)       // symbols
    assert(out(3)._4 == false && out(3)._6 == false)       // bullets
    // doc 5: 4 lines, 2 ellipsis-ended = 50% > 30% -> f_ellipsis false.
    assert(out(4)._5 == false && out(4)._6 == false)
  }

  test("collocations: hand-computed PMI on a two-doc corpus, row-local pair gen") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(tiny, window = 2, minCount = 2, topK = 10)
    // pairs: (a,b)x2, (a,c), (b,c), (a,d), (b,d) -> only (a,b) reaches
    // minCount; nt=6 tokens, np=6 pairs, na=nb=2:
    // ratio = 2*6*6 / (2*2*6) = 3.0
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("a", "b", 2L, 3.0)))
    // Pair generation must be row-local: the only joins in the plan are
    // the two broadcast token-count joins AFTER aggregation — no
    // positions self-join (which would inflate L^2 rows per doc).
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"positions self-join leaked in:\n$plan")
  }

  test("hashSplit labels every row, roughly by weight, and is growth-stable") {
    import spark.implicits._
    val splits = Seq("train" -> 8.0, "valid" -> 1.0, "test" -> 1.0)
    val full = TextAnalysis.hashSplit(docs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full.size == docs.count()) // total labeling, no drops
    val frac = full.values.groupBy(identity).view.mapValues(_.size.toDouble / full.size)
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    assert(frac.getOrElse("valid", 0.0) + frac.getOrElse("test", 0.0) > 0.02)
    // Growth stability: the same doc gets the same split on a subset —
    // the leak-free property a seeded randomSplit does not have.
    val subset = TextAnalysis.hashSplit(docs.filter(col("doc_id") < 100), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("semantic dedup drops exactly the planted duplicates, keeps originals") {
    import spark.implicits._
    val corpus = embeddings.select("vec_id", "embedding")
      .union(embeddings.filter(col("vec_id") < 8)
        .select((col("vec_id") + 50000).as("vec_id"), col("embedding")))
    val survivors = Similarity.semanticDeduplicate(corpus, k = 8, threshold = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    val originals = embeddings.select("vec_id").as[Long].collect().toSet
    assert(survivors == originals) // copies dropped, every original kept
  }

  test("semantic dedup refuses a degenerate codebook instead of going quadratic") {
    val corpus = embeddings.select("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException](
      Similarity.semanticDeduplicate(corpus, k = 1, threshold = 0.9,
        maxClusterSize = 10L))
    assert(ex.getMessage.contains("raise k"))
  }

  test("broadcast-codebook assignment matches the embedded-expression form at k=4096") {
    import spark.implicits._
    // Deterministic synthetic vectors (dim 8, never zero-norm): large
    // enough for a k=4096 codebook, the regime where the codebook must
    // ride a broadcast variable instead of the expression tree.
    val vecs = spark.range(5000)
      .map(id => (id, Array.tabulate(8)(i => (((id * 31 + i * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 4096)
    val key = "spark.graft.ivfBroadcastCodebookK"
    def assign(): Seq[(Long, Long)] =
      Similarity.assignToCentroids(vecs, cents)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    try {
      spark.conf.set(key, "1000000") // force the embedded-expression form
      val embedded = assign()
      spark.conf.set(key, "1") // force the broadcast form
      val broadcasted = assign()
      assert(embedded.size == 5000)
      assert(embedded == broadcasted)
    } finally spark.conf.unset(key)
  }

  test("two-level assignment with nProbe >= cell count IS the exhaustive argmax") {
    import spark.implicits._
    // Row 3000 is zero-norm: NaN against every centroid — both kernels
    // must take the same global-min-id fallback for exact parity.
    val vecs = spark.range(3001)
      .map(id => (id, if (id == 3000L) Array.fill(8)(0f)
        else Array.tabulate(8)(i => (((id * 31 + i * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2000)
    val kKey = "spark.graft.twoLevelAssignK"
    val pKey = "spark.graft.twoLevelAssignNProbe"
    def assign(): Seq[(Long, Long)] =
      Similarity.assignToCentroids(vecs, cents)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    try {
      val exhaustive = assign() // k=2000 < default 8192: exhaustive kernel
      spark.conf.set(kKey, "64")     // force the two-level kernel...
      spark.conf.set(pKey, "1000000") // ...probing EVERY coarse cell
      assert(assign() == exhaustive) // same round6-cosine + min-id ties
    } finally { spark.conf.unset(kKey); spark.conf.unset(pKey) }
  }

  test("two-level assignment at default nProbe: duplicate-consistent, mostly exact") {
    import spark.implicits._
    val vecs = spark.range(3000)
      .map(id => (id, Array.tabulate(8)(i => (((id * 31 + i * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    // Planted exact duplicates of vectors 0..49 at ids 10000+.
    val corpus = vecs.union(vecs.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = vecs.filter(col("vec_id") < 2000)
    val kKey = "spark.graft.twoLevelAssignK"
    def assign(): Map[Long, Long] =
      Similarity.assignToCentroids(corpus, cents)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    try {
      val exhaustive = assign()
      spark.conf.set(kKey, "64")
      val twoLevel = assign()
      // Identical vectors agree under ANY deterministic kernel — the
      // property SemDeDup's exact-duplicate recall rests on.
      (0L until 50L).foreach(id => assert(twoLevel(id) == twoLevel(id + 10000)))
      // And the approximation is mild: the probed top-8 of ~45 cells
      // recovers the true argmax for the large majority of rows.
      val agree = exhaustive.count { case (id, cid) => twoLevel(id) == cid }
      assert(agree.toDouble / exhaustive.size >= 0.8,
        s"two-level agreement ${agree.toDouble / exhaustive.size}")
    } finally spark.conf.unset(kKey)
  }

  test("two-level kernel: all-NaN row falls back to the GLOBAL min id") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // Hand-built CSR layout where the min id (3) is NOT in cell 0 —
    // fineIds(0) would be the wrong fallback; bestCentroid's ascending
    // layout returns ids(0) = 3, and the two-level kernel must agree.
    val coarse = Array(Array(1f, 0f), Array(0f, 1f))
    val cellStart = Array(0, 1, 3)
    val fineIds = Array(7L, 3L, 5L)
    val fineVecs = Array(Array(1f, 0f), Array(0f, 1f), Array(0.5f, 0.5f))
    val zero = new GenericArrayData(Array(0f, 0f))
    val got = graft.functions.VectorExpressions.bestCentroidTwoLevel(
      zero, coarse, cellStart, fineIds, fineVecs, nProbe = 2)
    assert(got == 3L)
    val exhaustive = graft.functions.VectorExpressions.bestCentroid(
      zero, Array(3L, 5L, 7L), Array(fineVecs(1), fineVecs(2), fineVecs(0)))
    assert(exhaustive == 3L)
  }

  test("ivfTopK two-level probe selection: exact parity when every cell is probed, no q×k plan") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val kKey = "spark.graft.twoLevelAssignK"
    val pKey = "spark.graft.twoLevelAssignNProbe"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.select("query_id", "rank", "neighbor_id", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    try {
      // Default: 16 centroids stay on the crossJoin+window probe path.
      val smallPath = rows(
        Similarity.ivfTopK(embeddings, queries, centroids, k = 10, nProbe = 4))
      // Force the large-k regime (the conf-forced equivalent of k>8192)
      // probing EVERY coarse cell — probe selection is then exhaustive
      // over the same (round6 desc, id asc) key, so output must be
      // IDENTICAL to the crossJoin+window selection.
      spark.conf.set(kKey, "8")
      spark.conf.set(pKey, "1000000")
      val twoLevel = Similarity.ivfTopK(embeddings, queries, centroids,
        k = 10, nProbe = 4)
      val plan = twoLevel.queryExecution.executedPlan.toString
      assert(plan.contains("top_centroids_2level"),
        s"two-level probe expression missing from plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"q×k centroid crossJoin leaked into the two-level plan:\n$plan")
      assert(rows(twoLevel) == smallPath)
    } finally { spark.conf.unset(kKey); spark.conf.unset(pKey) }
  }

  test("ivfTopK two-level at bounded probe width costs little recall vs exact selection") {
    import spark.implicits._
    // 2000 centroids over a 3000-vector corpus with √k≈45 coarse cells and
    // the default 8-cell probe — the genuinely approximate regime (the
    // parity test above probes everything).
    val vecs = spark.range(3000)
      .map(id => (id, Array.tabulate(8)(i => (((id * 31 + i * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val centroids = vecs.filter(col("vec_id") < 2000)
    val kKey = "spark.graft.twoLevelAssignK"
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(vecs, queries, k = 10))
    // IVF recall on this corpus is inherently modest (2000 near-singleton
    // buckets, 4 probed) — the claim under test is that TWO-LEVEL probe
    // selection costs little recall vs the exact crossJoin+window
    // selection, not that IVF@nProbe=4 is near-exact.
    val exactSel = pairs(Similarity.ivfTopK(vecs, queries, centroids, k = 10, nProbe = 4))
    try {
      spark.conf.set(kKey, "64")
      val ivf = pairs(Similarity.ivfTopK(vecs, queries, centroids, k = 10, nProbe = 4))
      val exactRecall = brute.count(exactSel.contains).toDouble / brute.size
      val twoLevelRecall = brute.count(ivf.contains).toDouble / brute.size
      assert(twoLevelRecall >= exactRecall - 0.1,
        s"two-level IVF recall $twoLevelRecall vs exact-selection $exactRecall")
      assert(ivf.forall { case (q, n) => q != n })
    } finally spark.conf.unset(kKey)
  }

  test("semantic dedup contract holds under forced two-level assignment") {
    import spark.implicits._
    val corpus = embeddings.select("vec_id", "embedding")
      .union(embeddings.filter(col("vec_id") < 8)
        .select((col("vec_id") + 50000).as("vec_id"), col("embedding")))
    val kKey = "spark.graft.twoLevelAssignK"
    try {
      spark.conf.set(kKey, "4") // k=8 codebook goes through the 2-level path
      val survivors = Similarity.semanticDeduplicate(corpus, k = 8, threshold = 0.9999)
        .select("vec_id").as[Long].collect().toSet
      val originals = embeddings.select("vec_id").as[Long].collect().toSet
      assert(survivors == originals)
    } finally spark.conf.unset(kKey)
  }

  test("distributed-codebook kmeans (k past the broadcast bound) sustains semantic dedup") {
    import spark.implicits._
    val corpus = embeddings.select("vec_id", "embedding")
      .union(embeddings.filter(col("vec_id") < 8)
        .select((col("vec_id") + 50000).as("vec_id"), col("embedding")))
    val algoKey = "spark.graft.kmeansDistributedK"
    val key = "spark.graft.ivfBroadcastCodebookK"
    try {
      // Force k=8 past BOTH bounds: kmeansCentroids takes the distributed
      // path (hash-bucket-mean init, Aggregator means, parquet-backed
      // codebook) while assignment rides the broadcast variable. The
      // planted-duplicate contract must hold identically.
      spark.conf.set(algoKey, "4")
      spark.conf.set(key, "4")
      val cents = Similarity.kmeansCentroids(corpus, k = 8, iters = 2)
      assert(cents.columns.toSeq == Seq("vec_id", "embedding"))
      val ids = cents.select("vec_id").as[Long].collect().sorted
      assert(ids.nonEmpty && ids.length <= 8 && ids.forall(c => c >= 0 && c < 8))
      assert(cents.select(size(col("embedding"))).as[Int].head() ==
        embeddings.select(size(col("embedding"))).as[Int].head())
      val survivors = Similarity.semanticDeduplicate(corpus, k = 8, threshold = 0.9999)
        .select("vec_id").as[Long].collect().toSet
      val originals = embeddings.select("vec_id").as[Long].collect().toSet
      assert(survivors == originals)
    } finally { spark.conf.unset(algoKey); spark.conf.unset(key) }
  }

  test("distributed init survives structured vec_ids (stride sharing a factor with k)") {
    import spark.implicits._
    // monotonically_increasing_id-style ids: a large power-of-two stride.
    // Raw `vec_id % k` with k=4 maps EVERY id to residue 0 — one init
    // seed, empty clusters never re-seeded; the hash-bucket init must
    // still spread seeds over ~k cells.
    val vecs = spark.range(64)
      .map(i => (i * 4096L, Array.tabulate(8)(j => (((i * 31 + j * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val algoKey = "spark.graft.kmeansDistributedK"
    try {
      spark.conf.set(algoKey, "2")
      val cents = Similarity.kmeansCentroids(vecs, k = 4, iters = 1)
      assert(cents.count() >= 3, "hash-bucket init collapsed under strided ids")
    } finally spark.conf.unset(algoKey)
  }

  test("componentsFromPairs labels arbitrary pair graphs with the min id") {
    import spark.implicits._
    // Chain 1-2-3-4, triangle 10-11-12, lone edge 20-21.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val labels = Dedup.componentsFromPairs(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("auto hot-shingle cap bounds candidates under planted boilerplate") {
    import spark.implicits._
    // 100 docs share one boilerplate trigram but are otherwise disjoint;
    // docs 0/1 are a true near-dup pair through NON-hot shingles. Uncapped
    // candidate generation pays 100*99/2 pairs for the boilerplate alone;
    // the auto cap (floor 64 < df 100) drops it from candidate gen.
    val boiler = "subscribe to our newsletter"
    val corpus = (0 until 100).map { i =>
      val body =
        if (i <= 1) "identical payload text shared by the pair exactly"
        else s"unique$i body$i words$i nothing$i common$i here$i"
      (i.toLong, s"$body $boiler")
    }.toDF("doc_id", "text")
    val sh = Dedup.shinglesJit(corpus, 3)
    val cap = Dedup.resolveShingleCap(Dedup.AutoShingleDf, corpus.count())
    assert(cap == 64L)
    val capped = Dedup.jaccardCandidates(sh, cap).count()
    val uncapped = Dedup.jaccardCandidates(sh, Long.MaxValue).count()
    assert(uncapped >= 4950L, s"uncapped candidates $uncapped")
    // Only pairs sharing a sub-cap shingle survive: the planted pair plus
    // the overlap window around the boilerplate splice point.
    assert(capped < 300L, s"capped candidates $capped")
    // The default (auto-capped) operator still finds the true pair, with
    // the exact Jaccard (verification counts ALL shingles, even hot ones).
    val pairs = Dedup.jaccardPairs(corpus, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("banded sign-LSH at 24 bits recalls the brute-force cosine pairs") {
    import spark.implicits._
    // Deterministic synthetic corpus: 60 random unit-ish vectors in dim 32,
    // the first 20 duplicated with a small perturbation (cosine ~0.999).
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = (0 until 60).map(i => (i.toLong, vec()))
    val dups = base.take(20).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    }
    val all = base ++ dups
    val corpus = all.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    // Brute-force truth set at the threshold (driver-side, 80 vectors).
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val threshold = 0.99
    val truth = (for {
      x <- all; y <- all if x._1 < y._1
      if BigDecimal(cos(x._2, y._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= threshold
    } yield (x._1, y._1)).toSet
    assert(truth.size >= 20, s"expected the 20 planted pairs, got ${truth.size}")
    // ≥24-bit buckets (the 100 TB occupancy depth); bands from the recall
    // formula — signLshParamsFor at a 20-billion-vector corpus (the 100 TB
    // regime) must go ≥24 bits deep, and the band count must push recall
    // back over the target even at that depth.
    val (bands, bits) = Similarity.signLshParamsFor(threshold,
      nVectors = 20_000_000_000L)
    assert(bits >= 24, s"expected >=24 bits, got $bits")
    val found = Similarity.cosineDuplicatesBanded(corpus, threshold, bands, bits)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.95, s"banded sign-LSH recall $recall at $bands×$bits")
    // verification makes precision exact: nothing below the threshold.
    assert(found.subsetOf(truth))
  }

  test("deduplicate removes every non-minimum member of each dup cluster") {
    import spark.implicits._
    // Chain cluster: 0-1, 1-2 near-dups (transitive) + isolated docs.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val corpus = Seq(
      (0L, base), (1L, base + "tail"), (2L, base + "tail2"),
      (10L, "completely different words here nothing shared at all " * 6),
      (11L, "another unrelated document with its own vocabulary set " * 6))
      .toDF("doc_id", "text")
    val kept = Dedup.deduplicate(corpus, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 10L, 11L))
  }

  test("deduplicate converges on a duplicate chain of diameter 9") {
    import spark.implicits._
    // 10 sliding windows (20 words, stride 2) over distinct words: only
    // CONSECUTIVE windows share shingle-Jaccard 16/20 = 0.8 >= 0.7
    // (skip-one pairs sit at 14/22 = 0.64 < 0.7), so the dup graph is a
    // pure chain of diameter 9 — min-label propagation needs 9 rounds.
    // The pre-round-4 cap of 5 rounds returned WRONG output here.
    val vocab = Vector.tabulate(38)(i => f"w$i%03d")
    val chain = Seq.tabulate(10)(i => (i.toLong, vocab.slice(2 * i, 2 * i + 20).mkString(" ")))
    val isolated = Seq(
      (100L, Vector.tabulate(20)(i => s"u$i").mkString(" ")),
      (101L, Vector.tabulate(20)(i => s"v$i").mkString(" ")))
    val corpus = (chain ++ isolated).toDF("doc_id", "text")
    val kept = Dedup.deduplicate(corpus, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 100L, 101L), s"kept $kept")
  }

  test("deduplicate merges exact-dup groups through their representative") {
    import spark.implicits._
    val base = Vector.tabulate(30)(i => s"t$i").mkString(" ")
    val near = (Vector.tabulate(28)(i => s"t$i") ++ Vector("zz", "qq")).mkString(" ")
    val corpus = (
      // hot exact group (ids 0-5, identical) — collapsed to rep 0 pre-LSH
      (0L to 5L).map(i => (i, base)) ++
      Seq(
        (6L, near),                          // near-dup of the group (J ~ 0.87)
        (50L, "hi there"), (51L, "hi there"), // exact dups below shingle width
        (100L, Vector.tabulate(25)(i => s"u$i").mkString(" "))))
      .toDF("doc_id", "text")
    val kept = Dedup.deduplicate(corpus, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 50L, 100L), s"kept $kept")
  }

  test("deduplicate THROWS at the round cap instead of under-merging") {
    import spark.implicits._
    // Same diameter-9 chain as above; one propagation+jump round cannot
    // converge it, and a silent exit here would return wrong output.
    val vocab = Vector.tabulate(38)(i => f"w$i%03d")
    val chain = Seq.tabulate(10)(i => (i.toLong, vocab.slice(2 * i, 2 * i + 20).mkString(" ")))
    val corpus = chain.toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.deduplicate(corpus, threshold = 0.7, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("deduplicate at threshold 1.0 takes the exact path and leaks no cache") {
    val corpus = docs.select("doc_id", "text")
      .union(docs.filter(col("doc_id") < 7)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val kept = Dedup.deduplicate(corpus, threshold = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all)
    // Every operator-held persist must be paired with an unpersist; the
    // exact path holds none and the LSH path frees all of its rounds.
    assert(spark.sharedState.cacheManager.isEmpty,
      "deduplicate left entries in the cache manager")
  }

  test("kmeans centroids give IVF recall at least as good as naive centroids") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(embeddings, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val ivf = Similarity.ivfTopK(embeddings, queries, centroids, k = 10, nProbe = 4)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(ivf.contains).toDouble / brute.size
    }
    val naive = recall(embeddings.filter(col("vec_id") < 16))
    val kmeans = recall(Similarity.kmeansCentroids(embeddings, k = 16, iters = 3))
    assert(kmeans >= naive - 0.1, s"kmeans recall $kmeans vs naive $naive")
    assert(kmeans >= 0.3, s"kmeans recall $kmeans")
  }

  test("exact dedup keeps the minimum id of each duplicate group") {
    val corpus = docs.select("doc_id", "text")
      .union(docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val dups = Dedup.exact(corpus).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == (0 until 5).map(i => (i + 10000L, i.toLong)).toSet)
  }

  test("randomized corpora: minhash-LSH equals the exact Jaccard predicate") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    def doc(len: Int): String = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(s: String): String = {
      val ws = s.split(" ")
      ws.zipWithIndex.map { case (w, i) =>
        if (rnd.nextInt(20) == 0) vocab(rnd.nextInt(vocab.size)) else w
      }.mkString(" ")
    }
    val bases = Seq.tabulate(40)(i => (i.toLong, doc(30 + rnd.nextInt(40))))
    val nearDups = bases.take(12).map { case (id, t) => (id + 1000L, mutate(t)) }
    val corpus = (bases ++ nearDups).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(corpus, threshold = 0.7, maxShingleDf = Long.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(corpus, threshold = 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("randomized corpora: incrementalNear equals the brute-force three-stage oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    def doc(len: Int): String = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(s: String): String =
      s.split(" ").map(w =>
        if (rnd.nextInt(20) == 0) vocab(rnd.nextInt(vocab.size)) else w).mkString(" ")
    val archive = Seq.tabulate(40)(i => (i.toLong, doc(30 + rnd.nextInt(40))))
    // The increment mixes every drop category: exact archive copies,
    // near-dup mutations of archive docs, internal base+mutation groups,
    // shingle-less tiny docs (LSH-blind — the exact screen must carry
    // them), an exact within-increment duplicate pair, and fresh docs.
    val increment =
      archive.take(8).zipWithIndex.map { case ((_, t), i) => (100L + i, t) } ++
      archive.slice(8, 14).zipWithIndex.map { case ((_, t), i) => (120L + i, mutate(t)) } ++
      (0 until 6).flatMap { i =>
        val base = doc(30 + rnd.nextInt(40))
        Seq((140L + 2 * i, base), (141L + 2 * i, mutate(base)))
      } ++
      Seq((160L, "hi"), (161L, "hi"), (162L, "yo there")) ++
      Seq.tabulate(10)(i => (170L + i, doc(30 + rnd.nextInt(40))))
    // --- brute-force oracle, mirroring the documented three stages ---
    def shingleSet(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 3) Set.empty
      else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
    }
    def jac(x: Set[String], y: Set[String]): Double = {
      val i = (x & y).size
      if (i == 0) 0.0 else i.toDouble / (x.size + y.size - i)
    }
    val archiveTexts = archive.map(_._2).toSet
    val kept0 = increment.filterNot(d => archiveTexts.contains(d._2))
      .groupBy(_._2).map { case (_, ds) => ds.minBy(_._1) }.toSeq
    val aSh = archive.map { case (_, t) => shingleSet(t) }
    val kSh = kept0.map { case (id, t) => id -> shingleSet(t) }.toMap
    val dupOfKnown = kept0.collect {
      case (id, _) if aSh.exists(s => jac(kSh(id), s) >= 0.8) => id
    }.toSet
    val clean = kept0.map(_._1).filterNot(dupOfKnown).sorted
    val parent = collection.mutable.Map(clean.map(id => id -> id): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      i <- clean.indices; j <- (i + 1) until clean.size
      if jac(kSh(clean(i)), kSh(clean(j))) >= 0.8
    } { val (a, b) = (find(clean(i)), find(clean(j))); if (a != b) parent(math.max(a, b)) = math.min(a, b) }
    val expected = clean.filter(id => find(id) == id).toSet
    // Sanity: the generator actually produced every drop category.
    assert(kept0.size < increment.size)                 // exact screen fired
    assert(dupOfKnown.nonEmpty)                         // archive near-dups found
    assert(expected.size < clean.size)                  // within-batch components fired
    assert(expected.contains(160L) && expected.contains(162L)) // tiny docs survive via exact stage
    // --- the engine, both forms ---
    val incDf = increment.toDF("doc_id", "text")
    val knownDf = archive.toDF("doc_id", "text")
    val got = Dedup.incrementalNear(incDf, knownDf, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"convenience form: got ${got.toSeq.sorted} expected ${expected.toSeq.sorted}")
    val ix = Dedup.buildArchiveIndex(knownDf)
    val gotIdx = Dedup.incrementalNear(incDf, knownDf, ix, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIdx == expected, "ArchiveIndex form must match the convenience form")
  }

  test("native cosine/norm expressions are bit-identical to the ordered folds") {
    val l = embeddings.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .filter(col("ia") < 30)
    val r = embeddings.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      .filter(col("ib") < 30)
    val cmp = l.crossJoin(r).select(
      Similarity.cosine(col("ea"), col("eb")).as("c_expr"),
      Similarity.cosineFold(col("ea"), col("eb")).as("c_fold"),
      Similarity.norm(col("ea")).as("n_expr"),
      Similarity.normFold(col("ea")).as("n_fold"))
    assert(cmp.filter(col("c_expr") =!= col("c_fold") ||
      col("n_expr") =!= col("n_fold")).count() == 0)
    assert(cmp.count() == 900)
  }

  test("chunkWindows: full windows, stride overlap, and the short-doc case") {
    import spark.implicits._
    val corpus = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "a b c"))                                   // shorter than the window
      .toDF("doc_id", "text")
    val rows = TextAnalysis.chunkWindows(corpus, window = 40, stride = 30)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    // doc 1: starts 1, 31, 61 (start 91 would leave only a partial window).
    assert(rows.toSeq == Seq(
      (1L, 0L, 1L, 40L, "w1", "w40"),
      (1L, 1L, 31L, 40L, "w31", "w70"),
      (1L, 2L, 61L, 40L, "w61", "w100"),
      (2L, 0L, 1L, 3L, "a", "c")))
  }

  test("decodeFeatures dispatches by magic bytes to all five real parsers") {
    import spark.implicits._
    val d = docs.filter(col("doc_id") < 25)
    def m(r: Int) = d.filter(col("doc_id") % 5 === r)
    val assets =
      Multimodal.synthesizeWav(spark, m(0)).toDF("asset_id", "bytes")
        .union(Multimodal.synthesizeBmp(spark, m(1)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizeY4m(spark, m(2)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizePng(spark, m(3)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizeGif(spark, m(4)).toDF("asset_id", "bytes"))
        .union(Seq((999L, Array[Byte](1, 2, 3))).toDF("asset_id", "bytes"))
    val feats = Multimodal.decodeFeatures(spark, assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(feats.size == 26)
    (0 until 25).foreach { id =>
      val expect = Seq("wav", "bmp", "y4m", "png", "gif")(id % 5)
      assert(feats(id.toLong).format == expect, s"doc $id")
    }
    assert(feats(999L).format == "unknown" && feats(999L).size_bytes == 3)
    // Same text bytes → the three 16-wide image formats agree exactly, and
    // each format's value matches its dedicated decoder's oracle-checked
    // stat (pixel/luma/|sample| sums all derive from the same bytes).
    val texts = d.select("doc_id", "text").as[(Long, String)].collect().toMap
    feats.filter(_._1 < 25).foreach { case (id, f) =>
      val bytes = texts(id).getBytes("UTF-8")
      val byteSum = bytes.map(_ & 0xff).map(_.toLong).sum
      f.format match {
        case "wav" => assert(f.value_sum == bytes.map(b => math.abs(((b & 0xff) - 128) * 128).toLong).sum)
        case _     => assert(f.value_sum == byteSum) // bmp/png/gif pixel, y4m luma
      }
    }
  }

  test("decodeOne contains corrupt recognized payloads as 'error' rows") {
    // Plain text that sniffs as BMP ("BM..." prefix): must degrade to an
    // error row, not crash the partition (the crawl-garbage contract).
    val bmText = Multimodal.decodeOne(1L, "BMW sells cars".getBytes("UTF-8"))
    assert(bmText.format == "error" && bmText.size_bytes == 14)
    // A truncated PNG: signature + IHDR but no IDAT — used to spin the
    // inflate loop forever; must now land on the error row too.
    val png = Multimodal.synthesizePng(spark,
      docs.filter(col("doc_id") === 0)).collect()(0).png
    val truncated = png.take(8 + 8 + 13 + 4 + 4) // signature + IHDR, no IDAT
    val f = Multimodal.decodeOne(2L, truncated)
    assert(f.format == "error")
    // A WAV with a negative chunk size (corrupt header walk).
    val wav = Multimodal.synthesizeWav(spark,
      docs.filter(col("doc_id") === 0)).collect()(0).wav
    val bad = wav.clone()
    bad(16) = -1; bad(17) = -1; bad(18) = -1; bad(19) = -1 // fmt size -> -1
    assert(Multimodal.decodeOne(3L, bad).format == "error")
  }

  test("parseBmp decodes top-down bitmaps (negative BITMAPINFOHEADER height)") {
    val up = Multimodal.synthesizeBmp(spark,
      docs.filter(col("doc_id") === 1)).collect()(0).bmp
    // Flip to top-down: negate the height AND reverse the row order so
    // the pixels stay the same image.
    val b = java.nio.ByteBuffer.wrap(up.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val h = b.getInt(22)
    val stride = (16 * 3 + 3) & ~3
    val down = up.clone()
    b.putInt(22, -h)
    System.arraycopy(b.array(), 0, down, 0, 54)
    (0 until h).foreach { r =>
      System.arraycopy(up, 54 + r * stride, down, 54 + (h - 1 - r) * stride, stride)
    }
    val expect = Multimodal.parseBmp(1L, up)
    val got = Multimodal.parseBmp(1L, down)
    assert(got.height == expect.height && got.width == expect.width)
    assert(got.pixel_sum == expect.pixel_sum && got.n_nonzero == expect.n_nonzero)
  }

  test("parseGif decodes a foreign-encoder GIF (the canonical 1x1)") {
    // A well-known 1x1 GIF produced by a real encoder — exercises the
    // extension-block walk and a minCodeSize=2 LZW stream our synthesizer
    // never emits (it always uses 8).
    val bytes = java.util.Base64.getDecoder.decode(
      "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    val f = Multimodal.parseGif(1L, bytes)
    assert(f.width == 1 && f.height == 1)
    assert(f.pixel_sum == 0 && f.n_nonzero == 0) // single black pixel
    val auto = Multimodal.decodeOne(1L, bytes)
    assert(auto.format == "gif" && auto.units == 1)
  }

  test("GIF LZW round-trips through table growth and CLEAR resets") {
    // >4096 distinct-entry pressure: repetitive text drives the table
    // through the 9->10->11->12-bit widths and at least one CLEAR reset.
    // A 4-symbol random stream fills the table (~1 entry per ~5 symbols →
    // >4096 entries), forcing every width and a mid-stream CLEAR, while
    // its 2-bit entropy guarantees real compression.
    val rnd = new scala.util.Random(7)
    val big = Array.tabulate[Byte](60000)(_ => rnd.nextInt(4).toByte)
    val enc = Multimodal.lzwEncode(big, 8)
    assert(enc.length < big.length) // actually compresses
    val dec = Multimodal.lzwDecode(enc, 8, big.length, 0L)
    assert(dec.sameElements(big))
  }

  test("packShards: greedy contiguous shards, nothing lost, budget convention") {
    import spark.implicits._
    // Token counts 5,7,4,10,3; exclusive cumsums 0,5,12,16,26; budget 10
    // → shards floor(before/10) = 0,0,1,1,2.
    val corpus = Seq(
      (0L, "a b c d e"), (1L, "a b c d e f g"), (2L, "a b c d"),
      (3L, "a b c d e f g h i j"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val shards = TextAnalysis.packShards(corpus, budgetTokens = 10)
      .orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(shards.toSeq == Seq(
      (0L, 2L, 0L, 1L, 12L), (1L, 2L, 2L, 3L, 14L), (2L, 1L, 4L, 4L, 3L)))
    assert(shards.map(_._5).sum == 29L) // every token in exactly one shard
  }

  test("packShards invariants on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val budget = 50L + rnd.nextInt(100)
      val docs = (0 until 200).map { i =>
        (i.toLong, (0 to rnd.nextInt(30)).map(_ => "w").mkString(" "))
      }
      val total = docs.map(_._2.split(" ").length.toLong).sum
      val shards = TextAnalysis.packShards(docs.toDF("doc_id", "text"), budget)
        .orderBy("shard_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // Nothing lost, shards are contiguous id ranges, ids dense from 0.
      assert(shards.map(_._5).sum == total, s"trial $trial lost tokens")
      shards.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._1 == a._1 + 1 && b._3 == a._4 + 1, s"trial $trial not contiguous")
        case _ =>
      }
      // Every shard starts because the previous crossed the budget: all but
      // the last hold > budget - max_doc tokens; with single-doc minimum,
      // each shard's size exceeds budget only by its final document.
      shards.dropRight(1).zipWithIndex.foreach { case (s, i) =>
        assert(s._5 >= budget - 31, s"trial $trial shard $i underfull: $s")
      }
    }
  }

  test("unigramFreqScore: exact integer frequency reductions") {
    import spark.implicits._
    val corpus = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.unigramFreqScore(corpus, rareBelow = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // freqs: a=3, b=1, c=1
    assert(rows.toSeq == Seq((0L, 3L, 7L, 1L, 1L), (1L, 2L, 4L, 1L, 1L)))
  }

  test("stratifiedSample: k per stratum, capped by stratum size, deterministic") {
    val s1 = TextAnalysis.stratifiedSample(docs, "lang", perStratum = 5)
    val rows = s1.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val strataSizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_._2).view.mapValues(_.length).toMap
    strataSizes.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0) == math.min(5L, n).toInt, s"stratum $lang")
    }
    assert(rows.forall(_._3 <= 5))
    val again = TextAnalysis.stratifiedSample(docs, "lang", perStratum = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sortBy(r => (r._2, r._3)).toSeq == again.sortBy(r => (r._2, r._3)).toSeq)
  }

  test("capPerGroup: two-phase heap top-N equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val got = TextAnalysis.capPerGroup(docs, "source", 5, "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val naive = docs
      .select(col("doc_id"), col("source"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.groupBy(_._2).forall(_._2.size <= 5))
    // repartitioning must not change the retained set or the ranks
    val shuffled = TextAnalysis.capPerGroup(docs.repartition(7), "source", 5, "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(shuffled == naive)
  }

  test("decontaminateByEmbedding flags exact and near copies, spares the rest") {
    import spark.implicits._
    val ev = Seq((100L, Seq(1f, 0f, 0f, 0f)), (101L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Seq(2f, 0f, 0f, 0f)),     // scaled copy of eval 100 -> cos 1.0
      (1L, Seq(0.9f, 0.1f, 0f, 0f)), // near copy -> cos ~0.994
      (2L, Seq(0f, 0f, 1f, 0f)),     // orthogonal to both
      (3L, Seq(1f, 1f, 0f, 0f)))     // cos ~0.707 vs both
      .toDF("vec_id", "embedding")
    val out = Similarity.decontaminateByEmbedding(corpus, ev, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }

  test("importanceWeights ranks target-vocabulary docs above raw-typical docs") {
    import spark.implicits._
    // target docs speak {tea, scone}; raw background speaks {ore, slag}.
    val corpus = Seq(
      (0L, "tea scone tea scone", true), (1L, "tea scone scone tea", true),
      (2L, "ore slag ore slag", false), (3L, "slag ore slag ore", false),
      (4L, "tea scone tea tea", false),   // target-like but NOT in target set
      (5L, "ore slag ore ore", false))
      .toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.importanceWeights(
        corpus, col("is_t"), topK = 4, topN = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val score = out.toMap
    // every target-vocab doc must outrank every raw-typical doc, and the
    // out-of-target doc with target vocabulary scores like the target docs
    assert(score(4L) > score(2L) && score(4L) > score(3L) && score(4L) > score(5L))
    assert(Seq(0L, 1L).forall(d => score(d) > score(2L)))
    // ranking is (llr_micro desc, doc_id asc) over all requested docs
    assert(out.sortBy(t => (-t._2, t._1)).toSeq == out.toSeq)
  }

  test("Bpe.train learns the hand-computed merge sequence") {
    import spark.implicits._
    // words: ab ×2, abc ×1 → pairs (a,b)=3, (b,c)=1 → merge 1 = (a,b);
    // state ab:[ab], abc:[ab,c] → merge 2 = (ab,c); then no pairs remain.
    val corpus = Seq((0L, "ab ab"), (1L, "abc")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, nMerges = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq((1L, "a", "b"), (2L, "ab", "c")))
  }

  test("Bpe merge is greedy left-to-right non-overlapping; ties break lexicographically") {
    import spark.implicits._
    // "aaa" under (a,a): greedy LTR → [aa, a], so round 2 sees (aa,a).
    val runs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val m = Bpe.train(runs, nMerges = 2).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m.toSeq == Seq(("a", "a"), ("aa", "a")))
    // tie on count (each pair appears once): (x,y) < (y,z) lexicographically
    val tie = Seq((0L, "xy"), (1L, "yz")).toDF("doc_id", "text")
    val first = Bpe.train(tie, nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(first.toSeq == Seq(("x", "y")))
  }

  test("Bpe.pairStats matches a hand-computed weighted pair table") {
    import spark.implicits._
    val corpus = Seq((0L, "ab ab  abc"), (1L, "b")).toDF("doc_id", "text")
    // wf: ab=2, abc=1, b=1 (empty word from the double space dropped);
    // pairs: (a,b) 2+1=3, (b,c) 1; single-char 'b' contributes none.
    val got = Bpe.pairStats(corpus, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 3L), ("b", "c", 1L)))
  }

  test("quality classifier separates planted classes and GD descends") {
    import spark.implicits._
    val good = Seq("clear prose with varied informative vocabulary",
      "well structured argument citing careful evidence",
      "thoughtful analysis of the measured results")
    val spam = Seq("click here buy now free offer",
      "winner winner claim your free prize now",
      "buy cheap click buy click buy")
    val corpus = (0 until 120).map { i =>
      val pool = if (i % 2 == 0) good else spam
      (i.toLong, pool(i % 3), if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
    val zero = new Array[Double](33)
    val w = QualityClassifier.train(corpus, "label", dim = 32, iters = 50, lr = 10.0)
    assert(QualityClassifier.loss(corpus, "label", w) <
      QualityClassifier.loss(corpus, "label", zero) - 0.1,
      "gradient descent must reduce the logistic loss")
    val acc = QualityClassifier.score(corpus, w)
      .select(((col("p") >= 0.5).cast("int") === col("label").cast("int")).cast("int"))
      .as[Int].collect()
    assert(acc.sum >= 114, s"classifier should separate planted classes: ${acc.sum}/120")
  }

  test("bm25Rank: hand-computed scores, tie order, and a TakeOrdered top-k plan") {
    import spark.implicits._
    // 3 docs, query = {q}: doc 1 has tf=2 over dl=4, doc 2 tf=1 over
    // dl=2, doc 3 no hit. N=3, T=9, df=2 → idf = ln((3-2+0.5)/2.5) =
    // ln(0.6) < 0 (the standard Robertson negative idf for a
    // majority-corpus term), so the LESS matching doc ranks first;
    // tfnorm = 22·T·tf/(10·T·tf+3T+9·dl·N).
    val docs = Seq((1L, "q a q b"), (2L, "q c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25Rank(docs, Seq("q"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def micro(tf: Long, dl: Long): Long = {
      val n = 3.0; val t = 9.0
      math.floor(1e6 * math.log((n - 2 + 0.5) / 2.5) *
        (22.0 * t * tf) / (10.0 * t * tf + 3.0 * t + 9.0 * dl * n)).toLong
    }
    assert(got.toSeq == Seq((1L, 2L, micro(1, 2)), (2L, 1L, micro(2, 4))))
    // A rare term scores POSITIVE and the hit outranks the miss.
    val got2 = TextAnalysis.bm25Rank(docs, Seq("x"), k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSeq == Seq((1L, 3L)))
    // top-k folds into TakeOrdered — never a global window over all
    // scored docs.
    val plan = TextAnalysis.bm25Rank(docs, Seq("q"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
  }

  test("z-order layout keeps BOTH columns' file stats tight (measured via footers)") {
    import spark.implicits._
    // A grid where the two keys are independent: single-column sorting
    // makes the OTHER column's per-file stats span the whole domain;
    // the Morton curve keeps both bounded.
    val n = 1 << 14
    val grid = spark.range(n).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    def spread(df: org.apache.spark.sql.DataFrame, colName: String): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zq").toString
      df.write.mode("overwrite").parquet(dir)
      // per-FILE min/max via one read keyed by input file — what a
      // footer-stats-driven reader would prune on
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(colName)) - min(col(colName))).as("spread"))
        .agg(avg("spread")).head().getDouble(0)
    }
    val zOrdered = ZOrder.cluster(grid, "x", "y", bits = 7, partitions = 16)
    val ySorted = grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
    val zx = spread(zOrdered, "x"); val zy = spread(zOrdered, "y")
    val sx = spread(ySorted, "x"); val sy = spread(ySorted, "y")
    // y-sorted: y tight but x spans the whole 0..127 domain in EVERY
    // file. z-ordered: BOTH bounded well below the domain (ideal 16-way
    // Morton split of a 128x128 grid = 32x32 regions; range-boundary
    // sampling slop admits some excess).
    assert(sx > 120, s"y-sorted x-spread should span the domain: $sx")
    assert(zx < 0.7 * sx, s"z-order x-spread $zx vs y-sorted $sx")
    assert(zx < 80 && zy < 80, s"both spreads bounded: $zx / $zy (y-sorted: $sx / $sy)")
    // Degenerate inputs (round-17 advice fix): empty and all-null frames
    // have no bounds — cluster returns z = 0 rows instead of an NPE.
    assert(ZOrder.cluster(grid.limit(0), "x", "y").count() == 0L)
    val nulls = spark.range(3).select(lit(null).cast("long").as("x"),
      lit(null).cast("long").as("y"))
    assert(ZOrder.cluster(nulls, "x", "y").select("z").collect()
      .forall(_.getLong(0) == 0L))
    // Wide-range inputs that overflow (x-min)*buckets in Long arithmetic
    // still quantize monotonically (the decimal-widened multiply).
    val wide = Seq(Long.MinValue + 1, -1L, 0L, Long.MaxValue).toDF("x")
      .select(col("x"), lit(0L).as("y"))
    val q = wide.select(ZOrder.quantize(col("x"), Long.MinValue + 1,
      Long.MaxValue, 8).as("q")).collect().map(_.getLong(0)).toSeq
    assert(q == q.sorted && q.head == 0L && q.last == 255L, s"q=$q")
  }

  test("capped candidate plan: full-index df cap is an anti-join before the prefix filter") {
    val sh = Dedup.shinglesJit(docs, 3)
    val plan = Dedup.jaccardCandidates(sh, 64, Some(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti-join cap in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs stage in:\n$plan")
    // the df count partial-aggregates before its exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial agg in:\n$plan")
  }

  test("SuffixSpans: maximal spans with exact boundaries; equals the index form") {
    import spark.implicits._
    // docB embeds tokens 5..25 of docA (21 tokens) between unique pads;
    // docC is unrelated. ONE maximal span per doc, interior boundaries.
    val aToks = (1 to 40).map(i => s"a$i")
    val corpus = Seq(
      (1L, aToks.mkString(" ")),
      (2L, ("padL " + aToks.slice(4, 25).mkString(" ") + " padR")),
      (3L, (1 to 30).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = SuffixSpans.dupSpans(corpus, minLen = 15)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L, 25L, 21L), (2L, 2L, 22L, 21L)))
    // A span shorter than the threshold is invisible.
    val none = SuffixSpans.dupSpans(corpus, minLen = 22).count()
    assert(none == 0L)
    // Output-equivalence with the inverted-index formulation on real
    // data: per-doc (covered tokens, run count) must match spanDupStats
    // at the same n — the two plans compute one semantics.
    val viaSort = SuffixSpans.dupSpans(docs, minLen = 15)
      .groupBy("doc_id")
      .agg(sum("span_len").as("dup_tokens"), count(lit(1)).as("n_spans"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIndex = TextAnalysis.spanDupStats(docs, n = 15)
      .select("doc_id", "dup_tokens", "n_spans")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSort == viaIndex)
    // The 128-bit fingerprint keys (the 100 TB default — 28-byte
    // shuffle rows instead of the joined token string) compute the
    // IDENTICAL span set as the exact string keys, row for row.
    val fpRows = SuffixSpans.dupSpans(docs, minLen = 15)
      .collect().map(_.toSeq).toSet
    val exactRows = SuffixSpans.dupSpans(docs, minLen = 15,
        fingerprint = false)
      .collect().map(_.toSeq).toSet
    assert(fpRows == exactRows)
    assert(fpRows.nonEmpty)
  }

  test("scoreLexicon: exact integer z_milli and keep = (z >= 0)") {
    import spark.implicits._
    // presence indicators over DISTINCT-irrelevant tokens: repeated 'buy'
    // counts once per presence term; absent tokens contribute 0; null
    // text scores just the intercept.
    val docs = Seq((1L, "buy now buy cheap"), (2L, "clear prose"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val lex = Seq("buy" -> -900L, "cheap" -> -300L, "clear" -> 1500L)
    val got = QualityClassifier.scoreLexicon(docs, lex, interceptMilli = 1000L)
      .select("doc_id", "z_milli", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1000L - 900L - 300L, false),
      (2L, 1000L + 1500L, true), (3L, 1000L, true)))
  }

  test("vocabCoverage: hand-computed OOV rates under a tiny vocabulary") {
    import spark.implicits._
    // vocab top-2 by count (tie → token asc): a(4), b(3). OOV = {c, d}.
    val corpus = Seq(("s1", "a a b c"), ("s2", "a b d d"), ("s3", "a b"))
      .toDF("source", "text")
    val got = TextAnalysis.vocabCoverage(corpus, topK = 2)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("s1", 4L, 1L, 250L), ("s2", 4L, 2L, 500L),
      ("s3", 2L, 0L, 0L)))
  }

  test("intervalJoin equals the naive range-predicate join, half-open bounds") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 5L), (2L, 10L), (3L, 17L), (4L, 29L), (5L, 30L))
      .toDF("pid", "t")
    val ivs = Seq(("a", 0L, 10L), ("b", 5L, 30L), ("c", 10L, 10L), ("d", 20L, 5L))
      .toDF("iv", "lo", "hi") // c empty, d inverted
    for (width <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.intervalJoin(pts, "t", ivs, "lo", "hi", width)
        .select("pid", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val naive = pts.join(ivs, col("t") >= col("lo") && col("t") < col("hi"))
        .select("pid", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == naive, s"width $width")
      // hand-checked: t=10 is OUT of [0,10) but IN [5,30); t=30 matches nothing
      assert(naive == Set((0L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (3L, "b"), (4L, "b")))
    }
  }

  test("intervalJoin throws on degenerate intervals instead of fanning out") {
    import spark.implicits._
    val pts = Seq((0L, 50L)).toDF("pid", "t")
    val ivs = Seq(("huge", 0L, 1000000L)).toDF("iv", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(pts, "t", ivs, "lo", "hi",
        bucketWidth = 1L, maxSpanBuckets = 100).collect()
    }
    assert(e.getMessage != null)
  }

  test("near-dup deduplicate eagerly reclaims superseded scratch datasets") {
    import spark.implicits._
    val scratchRoot = java.nio.file.Files.createTempDirectory("graft_scrtest").toString
    spark.conf.set("spark.graft.scratchDir", scratchRoot)
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
      val corpus = Seq(
        (0L, base), (1L, base + "tail"), (2L, base + "tail2"),
        (10L, "unrelated words entirely disjoint vocabulary here okay " * 6))
        .toDF("doc_id", "text")
      Dedup.deduplicate(corpus, threshold = 0.5).collect()
      // After the call, only datasets the returned plan still references
      // may remain: the exact-hash table (xh) and the final labels round.
      // Band/shingle spills, the pair set, and every superseded labels
      // round must have been deleted eagerly.
      val sessionRoots = new java.io.File(scratchRoot).listFiles()
        .filter(_.getName.startsWith("graft_scratch_"))
      assert(sessionRoots.length == 1, s"expected one session root in $scratchRoot")
      val kinds = sessionRoots.head.listFiles().map(_.getName.takeWhile(_ != '_')).sorted
      assert(kinds.toSeq == Seq("labels", "xh"),
        s"superseded scratch must be reclaimed eagerly, found: ${kinds.mkString(",")}")
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
    }
  }

  test("observed quality counters ride the same pass as the action") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "short doc"), (1L, null.asInstanceOf[String]), (2L, ""),
      (3L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val (instrumented, obs) = Observe.corpusQuality(corpus, shortBelow = 20)
    assert(instrumented.count() == 4) // the only action — metrics ride it
    val m = obs.get
    assert(m("rows") == 4L)
    assert(m("null_or_empty") == 2L)
    // null → "", 1 token after split; "short doc" 2; "" 1; long doc 30.
    assert(m("short_docs") == 3L)
    assert(m("total_tokens") == 34L)
  }

  test("lshParamsFor: recall floor holds at the threshold, bands stay steep") {
    val (b8, r8) = Dedup.lshParamsFor(0.8)
    assert((b8, r8) == (32, 4)) // the operator default
    Seq(0.3, 0.5, 0.7, 0.9, 0.95).foreach { t =>
      val (b, r) = Dedup.lshParamsFor(t)
      assert(b * r == 128)
      val pDetect = 1 - math.pow(1 - math.pow(t, r), b)
      assert(pDetect >= 0.97, s"t=$t got ($b,$r) p=$pDetect")
      // and no steeper split (larger r) would also clear the floor
      val steeper = (r + 1 to 128).filter(128 % _ == 0)
      steeper.foreach { r2 =>
        val p2 = 1 - math.pow(1 - math.pow(t, r2), 128 / r2)
        assert(p2 < 0.97, s"t=$t should have picked r=$r2 (p=$p2)")
      }
    }
    // tuned banding still finds exactly the exact pairs at a lower threshold
    val (b, r) = Dedup.lshParamsFor(0.5)
    val exact = Dedup.jaccardPairs(docs.filter(col("doc_id") < 150), threshold = 0.5,
      maxShingleDf = Long.MaxValue)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs.filter(col("doc_id") < 150), threshold = 0.5,
        numHashes = 128, bands = b)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty && lsh == exact)
  }

  test("componentLabels memoizes per corpus: repeat calls run no new pipeline") {
    import spark.implicits._
    val scratchRoot = java.nio.file.Files.createTempDirectory("graft_memo").toString
    spark.conf.set("spark.graft.scratchDir", scratchRoot)
    try {
      val base = "one two three four five six seven eight nine ten " * 4
      val corpus = Seq((0L, base), (1L, base + "tail"),
        (5L, "all different over here nothing shared with those " * 4))
        .toDF("doc_id", "text")
      def labelDirs() = new java.io.File(scratchRoot).listFiles()
        .filter(_.getName.startsWith("graft_scratch_"))
        .flatMap(_.listFiles()).count(_.getName.startsWith("labels"))
      val first = Dedup.componentLabels(corpus, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val after1 = labelDirs()
      val second = Dedup.componentLabels(corpus, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(second == first)
      assert(labelDirs() == after1, "second call must reuse the memoized labels")
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
    }
  }

  test("componentLabels: every doc labeled with its cluster's min id") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val corpus = Seq(
      (0L, base), (1L, base + "tail"), (2L, base + "tail2"), // one chain cluster
      (10L, "completely different words here nothing shared at all " * 6),
      (11L, "completely different words here nothing shared at all " * 6)) // exact pair
      .toDF("doc_id", "text")
    val labels = Dedup.componentLabels(corpus, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("operators tolerate an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.deduplicate(empty, threshold = 0.8).count() == 0)
    assert(Dedup.deduplicate(empty, threshold = 1.0).count() == 0)
    assert(TextAnalysis.packShards(empty, 100).count() == 0)
    assert(TextAnalysis.stratifiedSample(empty, "text", 5).count() == 0)
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.quantizeInt8(emptyVecs).count() == 0)
  }

  test("dirty corpora with null text dedup as empty documents, never crash") {
    import spark.implicits._
    val corpus = Seq(
      (0L, null.asInstanceOf[String]), (1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "real content with several words here okay fine"))
      .toDF("doc_id", "text")
    // exact: nulls and "" are one duplicate group, min id kept.
    val dups = Dedup.exact(corpus).select("dup_id").collect().map(_.getLong(0)).toSet
    assert(dups == Set(1L, 2L))
    // the LSH path must not NPE and must keep the group's min id.
    val kept = Dedup.deduplicate(corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L))
    // signature/simhash passes tolerate nulls too.
    assert(Dedup.simhash(corpus).count() == 4)
    assert(Dedup.minhashBands(corpus, 32, 8, 3).filter(col("doc_id") === 0L).count() == 0)
  }

  test("n-gram operators tolerate 0/1/2-token and null documents") {
    import spark.implicits._
    // sequence(1, 0) yields [1, 0] (step -1), so an unguarded shingle
    // transform calls element_at(ws, 0) and throws on any sub-n-gram doc.
    val corpus = Seq(
      (0L, null.asInstanceOf[String]), (1L, ""), (2L, "one"),
      (3L, "one two"), (4L, "one two three"),
      (5L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // trigram-indexed: short docs produce zero shingles, never a crash.
    val fp = TextAnalysis.fingerprint(corpus).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fp(1L) == 0L && fp(2L) == 0L && fp(3L) == 0L && fp(4L) == 1L && fp(5L) == 4L)
    val rep = TextAnalysis.repetitionMetrics(corpus).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep(2L) == 0L && rep(3L) == 0L && rep(5L) == 0L)
    // bigram-indexed: 1-token docs emit no bigrams (and so no output row).
    val bg = TextAnalysis.bigramFreqScore(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!bg.contains(1L) && !bg.contains(2L) && bg(3L) == 1L && bg(4L) == 2L)
    // the Column-HOF shingle path matches the JIT'd tokenizer on shorts.
    val sa = Dedup.shingleArray(corpus, 3).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).size).toMap
    assert(sa(1L) == 0 && sa(2L) == 0 && sa(3L) == 0 && sa(4L) == 1 && sa(5L) == 4)
  }

  test("incrementalNear drops archive near-dups and within-batch components") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val other = "totally different content with no overlap whatsoever here " * 5
    val third = "yet another unrelated document body nothing shared at all " * 5
    val known = Seq((0L, base), (1L, other)).toDF("doc_id", "text")
    val inc = Seq(
      (10L, base),            // exact archive collision → drop (stage 1)
      (11L, base + "tail"),   // NEAR-dup of archived 0 → drop (stage 2)
      (12L, third),           // fresh cluster, min id → keep
      (13L, third + "x"),     // near-dup of 12 within batch → drop (stage 3)
      (14L, "short"))         // shingle-less, unseen hash → keep
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalNear(inc, known, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 14L))
  }

  test("incrementalNear with a stored ArchiveIndex never re-derives archive signatures") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val other = "totally different content with no overlap whatsoever here " * 5
    val third = "yet another unrelated document body nothing shared at all " * 5
    val known = Seq((0L, base), (1L, other)).toDF("doc_id", "text")
    // Build the index from the TRUE archive and persist it, as a daily-crawl
    // pipeline would; reconstruct from the stored tables.
    val dir = java.nio.file.Files.createTempDirectory("graft_ix_").toString
    val built = Dedup.buildArchiveIndex(known)
    built.bands.write.mode("overwrite").parquet(s"$dir/bands")
    built.hashes.write.mode("overwrite").parquet(s"$dir/hashes")
    val stored = Dedup.ArchiveIndex(
      spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/hashes"),
      built.numHashes, built.numBands, built.shingleN)
    // Poison archive doc 1's text with a near-copy of increment doc 12's —
    // if the operator re-derived signatures from archive TEXT, doc 12 would
    // band-collide with doc 1 and be dropped. With the stored index it must
    // survive, while doc 11 (true near-dup of archived 0) is still caught
    // via the candidate-reduced verification read of doc 0's text.
    val poisoned = Seq((0L, base), (1L, third)).toDF("doc_id", "text")
    val inc = Seq(
      (10L, base),            // exact archive collision → drop (stored hashes)
      (11L, base + "tail"),   // NEAR-dup of archived 0 → drop (stored bands)
      (12L, third),           // fresh per the INDEX → keep
      (13L, third + "x"),     // near-dup of 12 within batch → drop
      (14L, "short"))         // shingle-less, unseen hash → keep
      .toDF("doc_id", "text")
    val keptIdx = Dedup.incrementalNear(inc, poisoned, stored, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIdx == Set(12L, 14L))
    // Negative control: the convenience form DOES re-derive from archive
    // text, so the poisoned copy kills doc 12 — proving the index above was
    // load-bearing, not incidentally equivalent.
    val keptConv = Dedup.incrementalNear(inc, poisoned, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptConv == Set(14L))
  }

  test("incrementalExact drops archive collisions and within-batch dups only") {
    import spark.implicits._
    val known = Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "alpha"),  // collides with archive → drop
      (11L, "gamma"), (12L, "gamma"), // within-batch dup → keep 11 only
      (13L, "delta")) // fresh → keep
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(inc, known)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
  }

  test("redactPii replaces and counts emails, phones, and IPs") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "reach me at a.user+x@mail.example.org or 555-123-4567 ok"),
      (1L, "server 192.168.0.1 and 10.0.0.255 serve plain text"),
      (2L, "nothing sensitive here at all"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.redactPii(corpus).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows(0) == ((0L, "reach me at <EMAIL> or <PHONE> ok", 1L, 1L, 0L)))
    assert(rows(1) == ((1L, "server <IP> and <IP> serve plain text", 0L, 0L, 2L)))
    assert(rows(2) == ((2L, "nothing sensitive here at all", 0L, 0L, 0L)))
  }

  test("dedupLines strips high-df lines, keeps order, keeps emptied docs") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "MENU\nunique zero body\nMENU\nFOOT"), // in-doc repeat counts df once
      (1L, "MENU\nfirst one\nsecond one\nFOOT"),
      (2L, "MENU\nFOOT"), // all boilerplate -> survives with empty text
      (3L, "MENU\nbody three\nFOOT"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.dedupLines(corpus, minDf = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // MENU df=4, FOOT df=4 -> removed; body lines df=1 -> kept in order.
    assert(rows(0) == ((0L, "unique zero body", 1L, 3L)))
    assert(rows(1) == ((1L, "first one\nsecond one", 2L, 2L)))
    assert(rows(2) == ((2L, "", 0L, 2L)))
    assert(rows(3) == ((3L, "body three", 1L, 2L)))
  }

  test("crossCorpusOverlap counts distinct shared n-grams per pair") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "one two three four five six seven"), // shares 5-grams with probe 1
      (11L, "totally disjoint words nothing common here at"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val rows = TextAnalysis.crossCorpusOverlap(corpus, probes, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // probe has 5-grams {1..5, 2..6}; doc 10 contains both.
    assert(rows.toSeq == Seq((10L, 1L, 2L)))
  }

  test("repetitionMetrics: trigram repeats and top-token share") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c a b c a b c"), // 7 trigrams, 3 distinct; 'a' x3 of 9
      (1L, "all distinct words only once"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionMetrics(corpus).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows(0) == ((0L, 9L, (4 * 1000 / 7).toLong, 3L, 333L)))
    assert(rows(1) == ((1L, 5L, 0L, 1L, 200L)))
  }

  test("two-phase operators are partition-invariant") {
    // The heap/prefix two-phase formulations must give identical results
    // no matter how the input is split — the property that makes them
    // safe replacements for single-task windows at scale.
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq(1, 3, 13).foreach { parts =>
      val d = docs.repartition(parts)
      val e = embeddings.repartition(parts)
      assert(canon(TextAnalysis.packShards(d, budgetTokens = 500)) ==
        canon(TextAnalysis.packShards(docs, budgetTokens = 500)), s"packShards @$parts")
      assert(canon(TextAnalysis.stratifiedSample(d, "lang", 5)) ==
        canon(TextAnalysis.stratifiedSample(docs, "lang", 5)), s"stratifiedSample @$parts")
      assert(canon(Similarity.bruteForceTopK(e,
          embeddings.filter(col("vec_id") < 3), k = 5)) ==
        canon(Similarity.bruteForceTopK(embeddings,
          embeddings.filter(col("vec_id") < 3), k = 5)), s"bruteForceTopK @$parts")
    }
  }

  test("int8 quantization: codes in range, dequantization error <= scale/2") {
    import spark.implicits._
    val rows = embeddings.limit(20)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val q = Similarity.quantizeInt8(embeddings.limit(20))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    rows.foreach { case (id, emb) =>
      val (mn, mx, n, codeSum) = q(id)
      assert(n == emb.length)
      assert(mn == emb.map(_.toDouble).min && mx == emb.map(_.toDouble).max)
      val scale = (mx - mn) / 255.0
      var expectedSum = 0L
      emb.foreach { f =>
        val c = if (mx > mn) math.round((f.toDouble - mn) * 255.0 / (mx - mn)) else 0L
        assert(c >= 0L && c <= 255L)
        // round-trip error bound: |dequant − v| ≤ scale/2
        assert(math.abs((mn + c * scale) - f.toDouble) <= scale / 2 + 1e-12)
        expectedSum += c
      }
      assert(codeSum == expectedSum)
    }
  }

  test("WAV round-trip: synthesized containers decode to text-derived features") {
    import spark.implicits._
    val corpus = Seq((0L, "ab c"), (1L, "zz")).toDF("doc_id", "text")
    val feats = Multimodal.decodeWav(spark,
        Multimodal.synthesizeWav(spark, corpus, sampleRate = 44100))
      .collect().sortBy(_.asset_id)
    // samples = (byte-128)*128: 'a'=97→-3968, 'b'=98→-3840, ' '=32→-12288,
    // 'c'=99→-3712, 'z'=122→-768
    assert(feats(0) == Multimodal.WavFeature(0L, 44100L, 1L, 4L, 12288L,
      3968L + 3840L + 12288L + 3712L))
    assert(feats(1) == Multimodal.WavFeature(1L, 44100L, 1L, 2L, 768L, 1536L))
  }

  test("container decoders reject malformed and unsupported payloads loudly") {
    import spark.implicits._
    def fails(f: => Unit): Unit =
      assertThrows[org.apache.spark.SparkException](f)
    // not a RIFF container
    fails(Multimodal.decodeWav(spark,
      Seq(Multimodal.WavAsset(1L, "JUNKJUNKJUNKJUNK".getBytes)).toDS()).collect())
    // valid RIFF magic but a compressed (non-PCM) format code
    val bad = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(85) // MP3 format code
      .putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(0)
    fails(Multimodal.decodeWav(spark,
      Seq(Multimodal.WavAsset(2L, bad.array())).toDS()).collect())
    // BMP magic check
    fails(Multimodal.decodeBmp(spark,
      Seq(Multimodal.BmpAsset(3L, Array[Byte](1, 2, 3, 4))).toDS()).collect())
    // Y4M magic check
    fails(Multimodal.decodeY4m(spark,
      Seq(Multimodal.Y4mAsset(4L, "NOTAY4M H8 W8\n".getBytes)).toDS()).collect())
  }

  test("WAV decoder walks chunk lists (LIST before data) instead of fixed offsets") {
    import spark.implicits._
    // Hand-build a container with a LIST chunk of ODD size between fmt
    // and data: a fixed-44-byte-offset reader mis-parses it; a chunk walk
    // with word alignment reads it correctly.
    val pcm = Array[Short](1000, -2000, 300)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val dataSize = pcm.length * 2
    val total = 12 + (8 + 16) + (8 + listBody.length + 1) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(16000).putInt(64000).putShort(4).putShort(16)
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody).put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    pcm.foreach(buf.putShort)
    val out = Multimodal.decodeWav(spark,
      Seq(Multimodal.WavAsset(7L, buf.array())).toDS()).collect()
    assert(out.toSeq == Seq(Multimodal.WavFeature(7L, 16000L, 2L, 3L, 2000L, 3300L)))
  }

  test("BMP round-trip: header dims, bottom-up rows, padded strides decode exactly") {
    import spark.implicits._
    // width 6 → stride 20 with 2 pad bytes per row: exercises padding.
    val corpus = Seq((0L, "abcdefgh"), (1L, "z")).toDF("doc_id", "text")
    val feats = Multimodal.decodeBmp(spark,
        Multimodal.synthesizeBmp(spark, corpus, width = 6))
      .collect().sortBy(_.asset_id)
    // doc 0: 8 bytes over 2 rows of 6; sum = Σascii, nonzero = 8.
    val sum0 = "abcdefgh".map(_.toInt).sum
    assert(feats(0) == Multimodal.BmpFeature(0L, 6L, 2L, sum0.toLong, 8L))
    assert(feats(1) == Multimodal.BmpFeature(1L, 6L, 1L, 'z'.toInt.toLong, 1L))
  }

  test("Y4M round-trip: multi-frame streams with frame markers decode exactly") {
    import spark.implicits._
    val text = "x" * 70 // 70 bytes over 8x8=64-byte luma planes → 2 frames
    val corpus = Seq((0L, text)).toDF("doc_id", "text")
    val feats = Multimodal.decodeY4m(spark,
        Multimodal.synthesizeY4m(spark, corpus, 8, 8)).collect()
    assert(feats.toSeq == Seq(
      Multimodal.Y4mFeature(0L, 8L, 8L, 2L, 70L * 'x'.toInt)))
  }

  test("PNG round-trip: deflated IDAT decodes to text-derived features") {
    import spark.implicits._
    val corpus = Seq((0L, "abcdefgh"), (1L, "z"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.decodePng(spark,
        Multimodal.synthesizePng(spark, corpus, width = 6))
      .collect().sortBy(_.asset_id)
    val sum0 = "abcdefgh".map(_.toInt).sum
    assert(feats(0) == Multimodal.PngFeature(0L, 6L, 2L, sum0.toLong, 8L))
    assert(feats(1) == Multimodal.PngFeature(1L, 6L, 1L, 'z'.toInt.toLong, 1L))
    assert(feats(2) == Multimodal.PngFeature(2L, 6L, 1L, 0L, 0L))
  }

  test("PNG decoder un-filters Sub/Up/Average/Paeth rows from foreign encoders") {
    import spark.implicits._
    // Hand-encode a 3x5 grayscale PNG using one row per filter type —
    // the synthesizer only emits filter 0, so this is what proves the
    // decoder handles real-world encoder output.
    val img = Array(
      Array(10, 20, 30),
      Array(15, 25, 35),   // Sub:     x - left
      Array(40, 50, 60),   // Up:      x - up
      Array(70, 80, 90),   // Average: x - (left+up)/2
      Array(95, 105, 115)) // Paeth:   x - paeth(left, up, ul)
    val filters = Array(0, 1, 2, 3, 4)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val w = 3
    val raw = new Array[Byte]((w + 1) * img.length)
    for (r <- img.indices) {
      raw(r * (w + 1)) = filters(r).toByte
      for (c <- 0 until w) {
        val left = if (c > 0) img(r)(c - 1) else 0
        val up = if (r > 0) img(r - 1)(c) else 0
        val ul = if (r > 0 && c > 0) img(r - 1)(c - 1) else 0
        val pred = filters(r) match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(r * (w + 1) + 1 + c) = ((img(r)(c) - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = out.toByteArray
    def chunk(buf: java.nio.ByteBuffer, tag: String, data: Array[Byte]): Unit = {
      val t = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      buf.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(img.length)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val buf = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length + 12)
    buf.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk(buf, "IHDR", ihdr); chunk(buf, "IDAT", idat); chunk(buf, "IEND", Array.emptyByteArray)
    val feats = Multimodal.decodePng(spark,
      Seq(Multimodal.PngAsset(9L, buf.array())).toDS()).collect()
    assert(feats.toSeq == Seq(Multimodal.PngFeature(9L, 3L, 5L,
      img.flatten.sum.toLong, 15L)))
  }

  test("PNG decoder rejects corrupt payloads (bad CRC, bad magic) loudly") {
    import spark.implicits._
    def fails(f: => Unit): Unit =
      assertThrows[org.apache.spark.SparkException](f)
    fails(Multimodal.decodePng(spark,
      Seq(Multimodal.PngAsset(1L, "NOTAPNGNOTAPNG".getBytes)).toDS()).collect())
    // Flip a byte inside the IDAT payload of a valid PNG → CRC check fires.
    val good = Multimodal.synthesizePng(spark,
      Seq((0L, "hello world")).toDF("doc_id", "text"), width = 4).collect().head.png
    val bad = good.clone()
    bad(8 + 25 + 8 + 2) = (bad(8 + 25 + 8 + 2) ^ 0x7f).toByte // inside IDAT data
    fails(Multimodal.decodePng(spark, Seq(Multimodal.PngAsset(2L, bad)).toDS()).collect())
  }

  test("bloom pruning keeps every matching row and the exact join result") {
    val orders = Engine.table(spark, SparkTestSession.sfDir, "orders")
    val lineitem = Engine.table(spark, SparkTestSession.sfDir, "lineitem")
    val dim = orders.filter(col("o_totalprice") > 400000).select("o_orderkey")
    val pruned = BloomPrune.pruned(lineitem, "l_orderkey", dim, "o_orderkey")
    val exact = lineitem.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val viaBloom = pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom == exact)
    // The filter must actually prune: at 1% fpp the survivors are close to
    // the matching set, far below the full fact table.
    val full = lineitem.count()
    val kept = pruned.count()
    assert(kept < full / 2, s"bloom kept $kept of $full")
  }

  test("span dedup: partial overlap keeps the seam, full coverage scrubs to empty") {
    import spark.implicits._
    val aToks = (1 to 40).map(i => s"a$i")
    val bToks = (1 to 40).map(i => s"b$i")
    // Chimera: A's first 20 tokens + a unique 5-token seam + B's last 20.
    val cToks = aToks.take(20) ++ (1 to 5).map(i => s"s$i") ++ bToks.drop(20)
    val corpus = Seq(
      (1L, aToks.mkString(" ")),
      (2L, bToks.mkString(" ")),
      (3L, cToks.mkString(" ")),
      (4L, "tiny doc under ten tokens")) // < n tokens: no grams at all
      .toDF("doc_id", "text")
    val stats = TextAnalysis.spanDupStats(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // A and B each share one 20-token region with C (one maximal span);
    // C carries both regions split by the seam (two spans); the tiny doc
    // has no 10-grams and must not appear.
    assert(stats == Map(
      1L -> ((40L, 20L, 1L)),
      2L -> ((40L, 20L, 1L)),
      3L -> ((45L, 40L, 2L))))
    val scrub = TextAnalysis.scrubDupSpans(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(scrub(1L) == ((20L, aToks.drop(20).mkString(" "))))
    assert(scrub(2L) == ((20L, bToks.take(20).mkString(" "))))
    assert(scrub(3L) == ((40L, "s1 s2 s3 s4 s5"))) // only the seam survives
    assert(scrub(4L) == ((0L, "tiny doc under ten tokens")))
  }

  test("randomized corpora: span stats and scrub match a brute-force oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val n = 5
    for (round <- 1 to 3) {
      val vocab = (1 to 8).map(i => s"w$i")
      val docs = (0 until 25).map { id =>
        val len = rnd.nextInt(25) // includes docs shorter than n (even 0)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // Brute force: gram -> distinct docs; positions covered by a gram
      // seen in >= 2 docs; maximal runs; scrub = kept tokens joined.
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val df = docs.flatMap { case (id, _) =>
        toks(id).sliding(n).filter(_.size == n).map(g => (g.mkString(" "), id))
      }.distinct.groupBy(_._1).view.mapValues(_.size).toMap
      val dupPos = docs.map { case (id, _) =>
        val ws = toks(id)
        val pos = (1 to math.max(0, ws.size - n + 1)).flatMap { s =>
          if (df.getOrElse(ws.slice(s - 1, s - 1 + n).mkString(" "), 0) >= 2)
            s to (s + n - 1)
          else Nil
        }.toSet
        id -> pos
      }.toMap
      val expStats = docs.flatMap { case (id, _) =>
        val pos = dupPos(id)
        if (pos.isEmpty) None
        else {
          val spans = pos.count(p => !pos.contains(p - 1))
          Some((id, toks(id).size.toLong, pos.size.toLong, spans.toLong))
        }
      }.sortBy(_._1)
      val expScrub = docs.map { case (id, _) =>
        val ws = toks(id)
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !dupPos(id).contains(i + 1) => w
        }
        (id, ws.size.toLong, dupPos(id).size.toLong, kept.mkString(" "))
      }.sortBy(_._1)
      val corpus = docs.toDF("doc_id", "text")
      val gotStats = TextAnalysis.spanDupStats(corpus, n = n).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotStats == expStats, s"stats mismatch round=$round")
      val gotScrub = TextAnalysis.scrubDupSpans(corpus, n = n).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(gotScrub == expScrub, s"scrub mismatch round=$round")
      // The 100 TB form (128-bit gram fingerprints on the shuffle) must
      // be observationally identical to the gram-string form.
      val gotFp = TextAnalysis.spanDupStats(corpus, n = n, fingerprint = true)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotFp == expStats, s"fingerprint-form mismatch round=$round")
    }
  }

  test("mixtureSample keeps the binding source whole and is deterministic") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val src = if (i < 100) "a" else if (i < 200) "b" else if (i < 300) "c" else "z"
      (i.toLong, s"t$i", src)
    }
    val corpus = rows.toDF("doc_id", "text", "source")
    // a binds (100/3 < 100/1); 'missing' has a weight but no rows; 'z' has
    // rows but no weight and must be dropped entirely.
    val weights = Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0, "missing" -> 9.0)
    val kept = TextAnalysis.mixtureSample(corpus, weights)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") == 100L, s"binding source must keep all rows: $bySrc")
    assert(!bySrc.contains("z"))
    assert(bySrc("b") > 10 && bySrc("b") < 60, s"~1/3 expected: $bySrc")
    assert(bySrc("c") > 10 && bySrc("c") < 60, s"~1/3 expected: $bySrc")
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.mixtureSample(corpus, weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2) // the same ROWS, not just the same counts
  }

  test("PQ codes: hand-traced small case, ties to the smaller codeword id") {
    import spark.implicits._
    // dim 4, m = 2 -> 2-dim subspaces. Codebook: two words.
    //   word 10: (0,0 | 0,0)   word 20: (3,4 | 1,0)
    // v1 (0,0,0.5,0): sub0 -> 10 (d 0 vs 25);
    //   sub1 d: 10 -> 0.25, 20 -> 0.25 TIE -> smaller id 10.
    // v2 (3,4,1,0): identical to word 20 -> (20, 20).
    val vecs = Seq(
      (10L, Seq(0f, 0f, 0f, 0f)), (20L, Seq(3f, 4f, 1f, 0f)),
      (1L, Seq(0f, 0f, 0.5f, 0f)), (2L, Seq(3f, 4f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val cb = vecs.filter(col("vec_id") >= 10)
    val codes = Similarity.quantizePQ(vecs.filter(col("vec_id") < 10), cb, m = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(codes(1L) == Seq(10L, 10L), s"got ${codes(1L)}")
    assert(codes(2L) == Seq(20L, 20L), s"got ${codes(2L)}")
    // Identical vectors always share codes — the dedup-recall property.
    assert(codes(2L) == Similarity.quantizePQ(cb, cb, m = 2)
      .filter(col("vec_id") === 20L)
      .head().getSeq[Long](1).toSeq)
  }

  test("PQ search: ADC top-k matches a local recompute over reconstructions") {
    val corpus = embeddings
    val queries = embeddings.filter(col("vec_id") < 5)
    val cb = embeddings.filter(col("vec_id") < 64)
    val m = 4
    val codes = Similarity.quantizePQ(corpus, cb, m)
    // The codes scan carries only (vec_id, codes) — m longs per row:
    // the search never reads raw embeddings, the PQ point at scale.
    assert(codes.columns.toSeq == Seq("vec_id", "codes"))
    val top = Similarity.pqTopK(codes, queries, cb, m, k = 10)
    // Ground truth: the SAME ADC distances computed locally from the
    // collected codes and codebook (the crossJoin path prunes nothing,
    // so the distributed top-k must be exactly the local one).
    val cbRows = cb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val cbIdx = cbRows.map(_._1).zipWithIndex.toMap
    val dim = cbRows(0)._2.length; val sub = dim / m
    val codeRows = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    val qRows = queries.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val expected = (for ((q, qe) <- qRows) yield {
      val scored = codeRows.filter(_._1 != q).map { case (nb, cs) =>
        var d = 0.0
        for (s <- 0 until m) {
          val w = cbRows(cbIdx(cs(s)))._2
          for (i <- 0 until sub) {
            val diff = qe(s * sub + i).toDouble - w(s * sub + i).toDouble
            d += diff * diff
          }
        }
        (nb, -d)
      }
      q -> scored.sortBy { case (nb, sim) => (-sim, nb) }.take(10)
        .map(_._1).toSeq
    }).toMap
    val got = top.orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    for ((q, exp) <- expected)
      assert(got(q) == exp, s"query $q: got ${got(q)} expected $exp")
  }

  test("IVF-PQ with all buckets probed reproduces pqTopK exactly") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val cb = embeddings.filter(col("vec_id") < 64)
    val m = 4
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val full = rows(Similarity.pqTopK(
      Similarity.quantizePQ(embeddings, cb, m), queries, cb, m, k = 10))
    val ivf = rows(Similarity.ivfPqTopK(
      embeddings, queries, centroids, cb, m, k = 10, nProbe = 16))
    assert(ivf == full)
    // Pruned probing returns k rows per query and a subset-quality
    // result (approximate by design — just shape-check it).
    val pruned = Similarity.ivfPqTopK(
      embeddings, queries, centroids, cb, m, k = 10, nProbe = 2)
    assert(pruned.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 10L))
  }

  test("IVF-PQ re-rank: full-probe full-shortlist equals brute force; " +
    "pruned recall envelope >= raw ADC (round 17)") {
    val queries = embeddings.filter(col("vec_id") < 5)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val cb = embeddings.filter(col("vec_id") < 64)
    val m = 4
    val n = embeddings.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bf = rows(Similarity.bruteForceTopK(embeddings, queries, k = 10))
    // nProbe = all centroids + shortlist = corpus → EXACT parity.
    val full = rows(Similarity.ivfPqRerankTopK(embeddings, queries,
      centroids, cb, m, k = 10, nProbe = 16, shortlist = n))
    assert(full == bf)
    // Pruned settings: re-ranked recall@10 vs brute force must be >= the
    // raw ADC ranking's recall on the SAME probe budget (exact scores
    // can only fix quantization inversions inside the candidate set).
    val truth = bf.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap
    def recall(got: Seq[(Long, Long, Long)]): Double = {
      val byQ = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
      byQ.map { case (q, s) =>
        s.intersect(truth(q)).size.toDouble / truth(q).size }.sum / byQ.size
    }
    val adc = recall(rows(Similarity.ivfPqTopK(embeddings, queries,
      centroids, cb, m, k = 10, nProbe = 4)))
    val rr = recall(rows(Similarity.ivfPqRerankTopK(embeddings, queries,
      centroids, cb, m, k = 10, nProbe = 4, shortlist = 50)))
    assert(rr >= adc, s"re-rank recall $rr < raw ADC recall $adc")
    assert(rr > 0.0)
  }

  test("ANN tuning grid: hits monotone in nProbe, scan cost strictly grows") {
    // The sim_ann_recall_grid lane's envelope: more probes can only add
    // candidates, so hits@10 vs brute force is non-decreasing and the
    // scanned-candidate count strictly increases (until all cells are
    // probed); total is 10 per query throughout.
    val grid = graft.SparkEntry.queries("sim_ann_recall_grid")(
      spark, SparkTestSession.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(grid.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    assert(grid.sliding(2).forall(p => p(1)._2 >= p(0)._2),
      s"hits not monotone: ${grid.mkString(", ")}")
    assert(grid.sliding(2).forall(p => p(1)._4 > p(0)._4),
      s"scan cost not growing: ${grid.mkString(", ")}")
    assert(grid.forall(g => g._2 <= g._3))
  }

  test("PQ guards: dimension must divide into m; unknown ADC code throws") {
    import spark.implicits._
    val vecs = Seq((0L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException](
      Similarity.quantizePQ(vecs, vecs, m = 2))
    assert(ex.getMessage.contains("divide evenly"), ex.getMessage)
  }

  test("perplexityScores ranks rare-bigram docs above corpus-typical docs") {
    import spark.implicits._
    // docs 0-3 repeat the SAME bigram chain (high-probability under the
    // corpus LM); doc 4 is the one permutation whose bigrams appear
    // nowhere else → highest per-bigram surprise. Doc 5 has one token
    // (no bigrams) and must be absent from the output entirely.
    val corpus = Seq(
      (0L, "a b c a b c a b c"), (1L, "a b c a b c"),
      (2L, "a b c a b c a b c a b c"), (3L, "a b c"),
      (4L, "c a c a b a"), (5L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityScores(corpus, topK = 4, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val score = out.map(t => t._1 -> t._3).toMap
    assert(!score.contains(5L), "single-token doc has no bigrams")
    assert(Seq(0L, 1L, 2L, 3L).forall(d => score(4L) > score(d)),
      s"permuted doc must score worst: $score")
    // n_bigrams is tokens-1
    assert(out.map(t => t._1 -> t._2).toMap ==
      Map(0L -> 8L, 1L -> 5L, 2L -> 11L, 3L -> 2L, 4L -> 5L))
    // ordering contract: (nll_micro desc, doc_id asc)
    assert(out.sortBy(t => (-t._3, t._1)).toSeq == out.toSeq)
  }

  test("PageRank integer fixed-point matches the hand-computed rounds") {
    import spark.implicits._
    // 1→2, 1→3, 2→3, 3→1: deg(1)=2, deg(2)=1, deg(3)=1; scale 1000,
    // base = 1000*15/100 = 150.
    // round 1: c(1)=500 each to 2,3; c(2)=1000 to 3; c(3)=1000 to 1
    //   r(1) = 150 + 85*1000 div 100 = 1000
    //   r(2) = 150 + 85*500  div 100 = 575
    //   r(3) = 150 + 85*1500 div 100 = 1425
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val r1 = PageRank.iterate(edges, iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000L, 2L -> 575L, 3L -> 1425L), r1.toString)
    // round 2 from (1000, 575, 1425): contributions
    //   to 2: 1000 div 2 = 500; to 3: 500 + 575 = 1075; to 1: 1425
    //   r(1) = 150 + 85*1425 div 100 = 150 + 1211 = 1361
    //   r(2) = 150 + 85*500  div 100 = 575
    //   r(3) = 150 + 85*1075 div 100 = 150 + 913 = 1063
    val r2 = PageRank.iterate(edges, iters = 2, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1361L, 2L -> 575L, 3L -> 1063L), r2.toString)
    // a sink-only node keeps collecting; a source-only node decays to base
    val e2 = Seq((7L, 8L)).toDF("u", "v")
    val s = PageRank.iterate(e2, iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s == Map(7L -> 150L, 8L -> 1000L), s.toString)
  }

  test("Bpe.encode applies merges in rank order with greedy L2R passes") {
    import spark.implicits._
    val corpus = Seq((0L, "scan sscan scscan ssccan anan aan xyz a")).toDF("doc_id", "text")
    val out = Bpe.encode(corpus, Seq(("s", "c"), ("a", "n"), ("sc", "an")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out == Map(
      "scan" -> List("scan"),
      "sscan" -> List("s", "scan"),
      "scscan" -> List("sc", "scan"),
      "ssccan" -> List("s", "sc", "c", "an"),
      "anan" -> List("an", "an"),
      "aan" -> List("a", "an"),
      "xyz" -> List("x", "y", "z"),
      "a" -> List("a")))
  }

  test("Bpe.encode under trained merges round-trips the trainer's state") {
    import spark.implicits._
    // train learns (a,b) then (ab,c) on this corpus (pinned above);
    // encode under those merges must reproduce the trainer's final
    // per-word symbol state: ab -> [ab], abc -> [abc].
    val corpus = Seq((0L, "ab ab"), (1L, "abc")).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, nMerges = 5).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.encode(corpus, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out == Map("ab" -> List("ab"), "abc" -> List("abc")))
  }

  test("blocklistFilter counts occurrences and blocks on the integer threshold") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "bad bad bad ok ok"),      // 3/5 hits -> blocked at 10%
      (1L, "ok ok ok ok ok ok ok ok ok bad"), // 1/10 = exactly 10% -> NOT blocked (strict >)
      (2L, "ok ok ok"),               // 0 hits -> kept, n_hits 0
      (3L, "bad ok ok ok ok ok ok ok ok")) // 1/9 > 10% -> blocked
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(corpus, Seq("bad"))
      .select("doc_id", "n_tokens", "n_hits", "blocked")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      0L -> ((5L, 3L, true)), 1L -> ((10L, 1L, false)),
      2L -> ((3L, 0L, false)), 3L -> ((9L, 1L, true))))
    // original columns ride through
    val cols = TextAnalysis.blocklistFilter(corpus, Seq("bad")).columns.toSeq
    assert(cols == Seq("doc_id", "text", "n_tokens", "n_hits", "blocked"))
  }

  test("perplexityScores folds out-of-vocab tokens into one OOV bucket") {
    import spark.implicits._
    // topK = 2 keeps only {x, y}; the rare tokens q/r/s all fold to the
    // OOV bucket, so doc 2's (q r) and doc 3's (r s) bigrams are the
    // SAME (OOV, OOV) event and the two docs score identically.
    val corpus = Seq(
      (0L, "x y x y x y"), (1L, "x y x y"),
      (2L, "q r"), (3L, "r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityScores(corpus, topK = 2, topN = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(2L) == out(3L), s"OOV bigrams must be indistinguishable: $out")
    assert(out(2L) > out(0L) && out(2L) > out(1L))
  }

  test("grid ANN paths are row-identical to the per-point calls (round-20 optimization)") {
    // The grid operators share one scan/ADC pass across all grid points
    // by the prefix property of the (score desc, id asc) total order —
    // this pins that sharing changes NOTHING row-wise.
    val queries = embeddings.filter(col("vec_id") < 5)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val cb = embeddings.filter(col("vec_id") < 64)
    def rows(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(r.get)).toSet
    val outCols = Seq("query_id", "rank", "neighbor_id", "sim")
    // IVF nProbe grid vs per-nProbe ivfTopK
    val nps = Seq(1, 2, 4, 8)
    val g = Similarity.ivfTopKGrid(embeddings, queries, centroids, k = 10,
      nProbes = nps)
    nps.foreach { np =>
      val per = rows(Similarity.ivfTopK(embeddings, queries, centroids,
        k = 10, nProbe = np), outCols)
      val slice = rows(g.topK.filter(col("nprobe") === np), outCols)
      assert(slice == per, s"ivfTopKGrid slice nProbe=$np diverges")
    }
    // scanned counts match the per-point candidate-set sizes
    val scannedMap = g.scanned.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scannedMap.keySet == nps.map(_.toLong).toSet)
    assert(nps.init.zip(nps.tail).forall { case (a, b) =>
      scannedMap(a.toLong) < scannedMap(b.toLong) })
    // PQ shortlist grid vs per-depth ivfPqRerankTopK
    val sls = Seq(10, 50, 200)
    val pg = Similarity.ivfPqRerankTopKGrid(embeddings, queries, centroids,
      cb, m = 4, k = 10, nProbe = 16, shortlists = sls)
    sls.foreach { sl =>
      val per = rows(Similarity.ivfPqRerankTopK(embeddings, queries,
        centroids, cb, m = 4, k = 10, nProbe = 16, shortlist = sl), outCols)
      val slice = rows(pg.filter(col("shortlist") === sl), outCols)
      assert(slice == per, s"ivfPqRerankTopKGrid slice shortlist=$sl diverges")
    }
  }
}
