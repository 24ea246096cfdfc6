package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page 1998; the crawl-prioritization /
  * page-quality score web-corpus pipelines rank their fetch frontier
  * with) over an `(u, v)` edge table, in INTEGER fixed-point
  * arithmetic: ranks are scaled longs, per-edge contributions are
  * `r div out_degree`, damping is `(num · s) div den`. Integer sums are
  * exact and ORDER-INDEPENDENT, so the result is bit-identical under
  * any partitioning and any engine — float PageRank can't be
  * hash-compared across engines because the per-node Σ re-orders
  * (same reason the quality classifier is oracle-less); fixed-point
  * trades ≤1 ulp-of-scale truncation per edge for exactness.
  *
  * Scale shape: degrees and the node set are computed ONCE from the
  * materialized edge table; each iteration is one equi-join of edges
  * against the (node, rank) state — both keyed on `u`, AQE-sizeable —
  * and one map-side-combined integer aggregation by `v`, then a left
  * join back to the static node set (dangling and source-only nodes
  * keep the teleport base). State is scratch-materialized per round
  * with the superseded round deleted eagerly, so plan depth stays O(1)
  * across iterations — the same lifecycle discipline as [[Bpe.train]]
  * and the Fixpoint operator. At 100 TB: edges partition by `u`, the
  * contribution shuffle is the per-round cost, and iteration count is
  * fixed — no data-dependent convergence loop to stall a cluster.
  */
object PageRank {

  /** `(node, r)` after `iters` rounds; `r` starts at `scale` for every
    * node reachable from the edge table (either side).
    */
  def iterate(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0, "PageRank: negative iteration count")
    val spark = edges.sparkSession
    val e = edges.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    // Materialize the edge table WITH its out-degree attached (round-20
    // optimization pass): the degree is static across rounds, but left
    // as a lazy aggregate it was re-computed and re-joined every
    // iteration — two joins per round where one suffices. One extra
    // count+join at build time, d rides the edge row from then on.
    val (eMat, _) = Scratch.materialize(
      e.join(e.groupBy("u").agg(count(lit(1)).as("d")), Seq("u")),
      "pr_edges")
    val (nodes, _) = Scratch.materialize(
      eMat.select(col("u").as("node"))
        .union(eMat.select(col("v").as("node"))).distinct(),
      "pr_nodes")
    val base = scale * (dampDen - dampNum) / dampDen
    var (state, stateDir) = Scratch.materialize(
      nodes.select(col("node"), lit(scale).as("r")), "pr_state")
    for (_ <- 1 to iters) {
      val contrib = eMat
        .join(state.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node"), expr("r div d").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
      val (mat, dir) = Scratch.materialize(next, "pr_state")
      Scratch.delete(spark, stateDir)
      state = mat; stateDir = dir
    }
    state
  }
}
