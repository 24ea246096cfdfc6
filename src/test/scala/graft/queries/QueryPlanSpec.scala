package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Physical-plan audits for the declared queries: filters/projections must
  * reach the parquet scan, dimension joins must broadcast, top-N must fold
  * into TakeOrderedAndProject, and candidate generation must never contain
  * a cartesian product. These are the plans we would want on a 1000-executor
  * cluster, asserted at local scale.
  */
class QueryPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def planString(df: DataFrame): String = {
    val exec = df.queryExecution.executedPlan
    val full = exec.toString
    // AQE hides the final plan until execution; the initial plan string
    // still carries scan/join/exchange shapes.
    full
  }

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("q01 pushes the shipdate filter and prunes columns at the scan") {
    val plan = planString(q("q01_pricing_summary"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_orderkey"),
      "scan should prune unused columns like l_orderkey")
  }

  test("q02 broadcasts the nation and region dimensions") {
    val plan = planString(q("q02_revenue_by_nation"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q28 top-N folds into TakeOrderedAndProject") {
    val plan = planString(q("q28_topn"))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-N pushdown in:\n$plan")
  }

  test("partial aggregation happens before the shuffle in q01") {
    val plan = planString(q("q01_pricing_summary"))
    // Two HashAggregate stages around one Exchange = map-side combine.
    assert("HashAggregate".r.findAllIn(plan).length >= 2, s"no partial agg in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("minhash LSH plan has no cartesian product") {
    // The un-spilled single-plan variant: minhashLsh itself materializes
    // stages to scratch parquet, so its returned plan is just a file scan.
    val plan = planString(
      graft.operators.Dedup.minhashLshPlan(
        graft.Engine.table(spark, sfDir, "documents"), threshold = 0.8))
    assert(!plan.contains("CartesianProduct"), s"LSH must bucket-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected bucket equi-joins in:\n$plan")
  }

  test("brute-force topk broadcasts the query side, not the corpus") {
    val e = graft.Engine.table(spark, sfDir, "embeddings")
    val plan = planString(graft.operators.Similarity.bruteForceTopK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 5), 10))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the tiny query set:\n$plan")
  }

  test("as-of join is linear: union + one hash shuffle, no join operator") {
    val plan = planString(q("q29_asof_join"))
    assert(!plan.contains("Join"), s"as-of must not pair-inflate via a join:\n$plan")
    assert(plan.contains("Union") && plan.contains("Window"))
    // One hash exchange for the per-user window; the groupBy reuses its
    // partitioning (the trailing range exchange is the final ORDER BY).
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one hash shuffle in:\n$plan")
  }

  test("IVF centroid assignment is a pure map: no exchange, join, or window") {
    import org.apache.spark.sql.functions.col
    val e = graft.Engine.table(spark, sfDir, "embeddings")
    val plan = planString(graft.operators.Similarity.assignToCentroids(
      e, e.filter(col("vec_id") < 16)))
    assert(plan.contains("best_centroid"), s"expected the codegen'd argmax in:\n$plan")
    Seq("Exchange", "Join", "Window", "Sort").foreach(op =>
      assert(!plan.contains(op), s"assignment must be row-local, found $op in:\n$plan"))
  }

  test("IVF large-k broadcast-codebook assignment stays a pure map") {
    import org.apache.spark.sql.functions.col
    val e = graft.Engine.table(spark, sfDir, "embeddings")
    val key = "spark.graft.ivfBroadcastCodebookK"
    spark.conf.set(key, "1") // force the broadcast form at any k
    try {
      val plan = planString(graft.operators.Similarity.assignToCentroids(
        e, e.filter(col("vec_id") < 16)))
      assert(plan.contains("best_centroid_bcast"),
        s"expected the broadcast-codebook argmax in:\n$plan")
      Seq("Exchange", "Join", "Window", "Sort").foreach(op =>
        assert(!plan.contains(op), s"assignment must be row-local, found $op in:\n$plan"))
    } finally spark.conf.unset(key)
  }

  test("partitioned parquet layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.Engine.table(spark, sfDir, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition pruning in:\n$plan")
    val all = spark.read.parquet(dir).count()
    val r = pruned.count()
    assert(r > 0 && r < all)
  }

  test("bloom pruning runs might_contain in the scan stage before any join") {
    val plan = planString(q("q46_bloom_prune"))
    assert(plan.contains("might_contain"), s"expected the bloom filter in:\n$plan")
    // The filter must sit BELOW the join: in the plan string (children
    // indented under parents) the first Join line appears before — i.e.
    // above — the might_contain filter line.
    val joinAt = plan.indexOf("HashJoin")
    val bloomAt = plan.indexOf("might_contain")
    assert(joinAt >= 0 && bloomAt > joinAt,
      s"bloom filter must be under the join, not above it:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("unigram frequency scoring lets AQE broadcast a Zipf-small vocabulary") {
    // No forced hint (a web-scale vocabulary must be allowed to fall back
    // to a shuffled join instead of OOMing): the broadcast decision is
    // AQE's, made from the aggregate's RUNTIME size — so execute, then
    // assert the final adaptive plan broadcast the vocab side.
    val df = q("lm_unigram_freq")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      s"AQE should broadcast the Zipf-small vocab at this SF:\n$plan")
  }

  test("sequence packing never funnels the corpus through one window partition") {
    val df = q("tokens_pack")
    val plan = planString(df)
    // The two-pass prefix-sum implementation must not plan a global
    // Window (Window.orderBy with no partitionBy = all rows in ONE task).
    assert(!plan.contains("Window"), s"found a global window in:\n$plan")
    // Assignment enters as a distributed RDD; aggregation is partial
    // before the shuffle.
    assert(plan.contains("ExternalRDD") || plan.contains("ExistingRDD") ||
      plan.contains("SerializeFromObject"),
      s"expected the RDD two-pass assignment in:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("join-strategy hints override the planner's size-based choice") {
    import org.apache.spark.sql.functions.col
    val nation = graft.Engine.table(spark, sfDir, "nation")
    val region = graft.Engine.table(spark, sfDir, "region")
    // Both tiny → the planner would broadcast; the merge hint must force
    // a sort-merge join (the safe choice when a "small" side is a
    // misestimate that would OOM the driver at real scale).
    val hinted = nation.join(region.hint("merge"),
      col("n_regionkey") === col("r_regionkey"))
    val plan = planString(hinted)
    assert(plan.contains("SortMergeJoin"), s"merge hint ignored in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"))
  }

  test("span dedup never goes corpus-squared and combines the df count map-side") {
    val plan = planString(q("text_span_stats"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs stage in:\n$plan")
    // The hot-gram reduction joins back as a semi-join (broadcast at this
    // SF; a shuffled hash semi-join at scale — either is fine, a nested
    // loop is not).
    assert(plan.contains("LeftSemi"), s"no semi-join reduction in:\n$plan")
    // df count = two HashAggregates around an Exchange (partial + final).
    assert("HashAggregate".r.findAllIn(plan).length >= 2, s"no partial agg in:\n$plan")
  }

  test("suffix-span dedup is sort-based: a range exchange, no join operator") {
    val plan = planString(graft.operators.SuffixSpans.dupSpans(
      graft.Engine.table(spark, sfDir, "documents"), minLen = 15))
    // The duplicate discovery is the SORT (range partitioning + in-
    // partition neighbor scan) — the suffix-array economics. Any join
    // operator here means the plan regressed to the inverted-index form.
    assert(plan.contains("rangepartitioning"), s"no range sort in:\n$plan")
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "CartesianProduct", "BroadcastNestedLoopJoin").foreach(op =>
      assert(!plan.contains(op), s"unexpected $op in:\n$plan"))
  }

  test("capped jaccard verify phase never goes all-pairs") {
    // The candidate stage (df-cap anti-join + prefix filter) executes
    // inside a scratch materialization and is plan-audited in
    // PipelineSpec where it is accessible; the final verify phase read
    // here must join candidate ids only — no all-pairs operator.
    val plan = planString(graft.operators.Dedup.jaccardPairs(
      graft.Engine.table(spark, sfDir, "documents"), threshold = 0.5,
      maxShingleDf = graft.operators.Dedup.AutoShingleDf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs stage in:\n$plan")
  }

  test("mixture sampling is a broadcast threshold join plus a row-local filter") {
    val plan = planString(q("sample_mixture"))
    assert(plan.contains("BroadcastHashJoin"), s"thresholds should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the |sources|-row threshold table must never shuffle the corpus:\n$plan")
    assert(plan.contains("md5"), s"keep-filter should be row-local md5:\n$plan")
  }

  test("weighted sampling is a pure row-local filter: no exchange or join") {
    val plan = planString(graft.operators.TextAnalysis.sampleByWeight(
      graft.Engine.table(spark, sfDir, "documents"),
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) / 2000.0))
    assert(!plan.contains("Exchange"), s"sampleByWeight must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"sampleByWeight must not join:\n$plan")
    // `*(1)` is the executedPlan string's whole-stage-codegen marker.
    assert(plan.contains("*(1) Filter"), s"expected one codegen'd stage:\n$plan")
  }

  test("cross-source overlap and dup-ratio bucket-join on the shingle, never cartesian") {
    val docs = graft.Engine.table(spark, sfDir, "documents")
    for (df <- Seq(graft.operators.Dedup.crossSourceOverlap(docs),
      graft.operators.Dedup.shingleDupRatio(docs))) {
      val plan = planString(df)
      assert(!plan.contains("CartesianProduct"),
        s"shingle joins must stay equi-joins:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"shingle joins must stay equi-joins:\n$plan")
    }
  }

  test("domain cap pre-prunes per partition: the window sees candidates, not the corpus") {
    val plan = planString(q("sample_domain_cap"))
    // Phase 1 is the bounded-heap mapPartitions; only its ≤ N×partitions
    // survivors reach the grouped exchange + window of phase 2.
    assert(plan.contains("MapPartitions"), s"expected the heap pre-prune:\n$plan")
    assert("Exchange hashpartitioning\\(grp".r.findAllIn(plan).length == 1,
      s"exactly one group exchange, fed by candidates only:\n$plan")
    assert(plan.contains("Window"), s"phase 2 ranks the survivors:\n$plan")
  }

  test("embedding decontamination broadcasts the eval set and combines map-side") {
    val plan = planString(q("decon_embedding"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the eval set must broadcast against the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing may shuffle the corpus against the eval set:\n$plan")
    // Partial max before the exchange: two HashAggregates per aggregate.
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"per-vector max must partial-aggregate map-side:\n$plan")
  }

  test("importance scoring joins the corpus to a broadcast vocabulary only") {
    val plan = planString(q("text_importance_llr"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the K-row log-ratio table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the token stream must never shuffle against the vocabulary:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must fold into TakeOrderedAndProject:\n$plan")
  }

  test("interval join bucketizes into an equi-join: no nested-loop, no cartesian") {
    val plan = planString(q("events_interval_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate must ride a bucket equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected the bucket equi-join:\n$plan")
  }

  test("perplexity scoring joins the corpus against broadcasts only") {
    val plan = planString(q("text_perplexity"))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab/count tables must broadcast against the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus must never shuffle against the model tables:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must fold into TakeOrderedAndProject:\n$plan")
  }

  test("blocklist filtering broadcasts the wordlist and combines hits map-side") {
    val plan = planString(q("text_blocklist"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the blocklist must broadcast against the exploded tokens:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"hit counts must partial-aggregate map-side:\n$plan")
  }

  test("BPE encode joins the corpus to the word table without nested loops") {
    val plan = planString(q("tokens_bpe_encode"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"corpus-to-word-table must be an equi-join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"per-source sums must partial-aggregate map-side:\n$plan")
  }

  test("funnel report is integer flags + one final 1-row broadcast expand") {
    val plan = planString(q("pipeline_funnel"))
    assert(!plan.contains("CartesianProduct"),
      s"the only cross join is the broadcast 1-row counts:\n$plan")
    // The stage expansion joins a 5-row local relation against the 1-row
    // aggregate — both broadcast-sized, never a corpus shuffle.
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected broadcast expand:\n$plan")
  }

  test("retention never self-joins events on time: user-keyed equi-joins only") {
    val plan = planString(q("events_retention"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"retention must be user-keyed equi-joins:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"first-seen / activity aggs must partial-aggregate map-side:\n$plan")
  }

  test("funnel stages are user-keyed equi-joins, no time-range self-join") {
    val plan = planString(q("events_funnel"))
    // the deadline window is a FILTER on the joined row, never a range
    // join condition that would degrade to a nested loop
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel cascade must stay equi-join + filter:\n$plan")
  }

  test("triangle closure is equi-joins over bounded adjacency, never cartesian") {
    val plan = planString(q("graph_triangles"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/closure work must be equi-joins:\n$plan")
    assert(plan.contains("array_intersect"),
      s"closure must be the row-local adjacency intersection:\n$plan")
  }

  test("temperature sampling: quota join broadcasts, corpus never globally sorted") {
    val plan = planString(q("sample_temperature"))
    assert(!plan.contains("CartesianProduct"),
      s"quota attach must not be cartesian (the 1-row total may broadcast):\n$plan")
    // the global Sort allowed is the presentation ORDER BY over the
    // quota-sized sample; the corpus-sized side must reach the heaps
    // un-sorted — asserted by the window running on the candidate set
    // (bounded heap output), which the mapPartitions stage precedes.
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      s"two-phase bounded-heap candidate stage missing:\n$plan")
  }

  test("ngram novelty is one membership join plus map-side folds") {
    val plan = planString(q("text_ngram_novelty"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty must never pair documents:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"per-doc verdict must partial-aggregate map-side:\n$plan")
  }

  test("positive pairs broadcast the anchors, not the corpus") {
    val plan = planString(q("sim_positive_pairs"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"anchor side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("flagship entry returns rows") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.length == 2)
  }
}
