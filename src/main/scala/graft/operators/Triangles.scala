package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the local-clustering primitive for
  * graph-shaped corpus signals (link-farm detection in a crawl graph,
  * community density before graph-based dedup, spam connectivity
  * scores). Complements [[PageRank]] (global importance) and the
  * Fixpoint reachability (connectivity) with the local-density measure.
  */
object Triangles {

  /** Per-node triangle counts over an undirected graph given as an edge
    * list (directions, duplicates, and self-loops tolerated — edges are
    * canonicalized first). Output: (node, n_tri) for nodes in ≥1
    * triangle.
    *
    * Algorithm — degree-ordered ADJACENCY INTERSECTION (the compact
    * form of Suri & Vassilvitskii's wedge closure, WWW'11): orient
    * every undirected edge from its LOWER-rank endpoint to its higher,
    * rank = (degree, id) packed into one comparable long. A triangle
    * with ranks x < y < z is then exactly one edge (x→y) whose
    * endpoints share the out-neighbor z: per oriented edge (u→v),
    * W = outAdj(u) ∩ outAdj(v) closes |W| triangles, each counted ONCE
    * (at its lowest-rank edge). Out-degree under degree-ordering is
    * O(√m) on any graph, so Σ|outAdj| payload is O(m) with bounded
    * arrays and total intersection work is O(m^1.5) — hub-proof where
    * the un-oriented form emits deg² wedges. vs the explicit wedge
    * join: the same asymptotic work, but the 2·#wedges intermediate
    * ROWS (24M at sf0.1 — the shuffle that dominated the first cut of
    * this operator) collapse into m edge rows carrying short arrays,
    * and the intersection itself is row-local `array_intersect`.
    *
    * Shuffle plan (round 20 — optimization pass): canonical distinct +
    * degree aggregate; rank attachment joins (AQE broadcasts the rank
    * table when the node set is small); ONE scratch materialization of
    * the ADJACENCY (src, nbrs) — not the oriented edge list. The edge
    * list is recovered from the adjacency itself by `explode(nbrs)`,
    * which hands every oriented edge its src-side neighbor array FOR
    * FREE, so the per-edge attach needs only the one dst-keyed join.
    * vs the previous shape (materialize oriented edges, rebuild the
    * adjacency from the scratch scan on BOTH sides of a two-join
    * attach): one groupBy aggregate instead of two, one join instead of
    * two, and the scratch round-trip carries n adjacency rows instead
    * of m edge rows. The three corner folds are map-side-combined
    * aggregates over output-sized rows.
    *
    * Rank packing requires node ids in [0, 2³¹): degree ≤ 2³¹ shifts
    * left 31 bits and the id fills the low bits — strictly ordered by
    * (degree, id), collision-free.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(least(col("u"), col("v")).cast("long").as("a"),
        greatest(col("u"), col("v")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .select(col("n"), (shiftleft(col("d"), 31) + col("n")).as("rank"))
    val ranked = e
      .join(deg.select(col("n").as("a"), col("rank").as("ra")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("rank").as("rb")), Seq("b"))
    val oriented = ranked.select(
      when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("src"),
      when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("dst"))
    // the consumers of the scratch dataset are lazy, so it must outlive
    // this method: the session shutdown hook owns cleanup (Scratch
    // contract) — no eager delete, the path binding is discarded.
    val (adj, _) = Scratch.materialize(
      oriented.groupBy("src").agg(collect_list("dst").as("nbrs")), "tri_adj")
    val withAdj = adj
      .select(col("src"), col("nbrs"), explode(col("nbrs")).as("dst"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nbrs_v")), Seq("dst"))
      .select(col("src"), col("dst"),
        array_intersect(col("nbrs"), col("nbrs_v")).as("w"))
      .filter(size(col("w")) > 0)
    // all three triangle corners fold in ONE pass: per edge, emit
    // (u, |W|), (v, |W|) and (w, 1) for each w ∈ W, then a single
    // map-side-combined sum — three separate corner aggregates would
    // recompute the join+intersection lineage three times.
    withAdj.select(explode(concat(
        array(
          struct(col("src").as("node"), size(col("w")).cast("long").as("c")),
          struct(col("dst").as("node"), size(col("w")).cast("long").as("c"))),
        transform(col("w"), wi => struct(wi.as("node"), lit(1L).as("c"))))).as("e"))
      .groupBy(col("e.node").as("node"))
      .agg(sum(col("e.c")).cast("long").as("n_tri"))
  }
}
