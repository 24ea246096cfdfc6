package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Bounded fixpoint iteration — the engine's answer to `WITH RECURSIVE`
  * (host surface the reference inherits from DuckDB; Spark has no general
  * recursion). Computes the least fixpoint of `seed UNION step(reached)`
  * with UNION-distinct semantics, exactly like a recursive CTE, by
  * SEMI-NAIVE iteration: `step` is applied only to each round's frontier
  * (the rows discovered last round), never to the whole accumulated set,
  * so round cost tracks the frontier, not the closure.
  *
  * Scale shape (same discipline as [[Dedup]]'s label propagation): every
  * round's frontier is materialized to scratch parquet — an un-truncated
  * iterative plan doubles per round and overflows the planner stack by
  * ~round 9 — the accumulated set is the flat multi-scan of those
  * disjoint frontier files (nothing is ever rewritten; total scratch =
  * one copy of the closure), and `maxRounds` is a runaway-recursion cap
  * that THROWS rather than returning a truncated (wrong) closure. Transitive closures with the
  * diameter-halving trick live in [[Dedup.componentLabels]]; this is the
  * general tool for everything else a recursive CTE would express
  * (reachability, bill-of-materials, org rollups).
  */
object Fixpoint {

  /** The accumulated distinct row set of `seed ∪ step(frontier₀) ∪ …`,
    * iterated until a round adds nothing new. `step` must return the
    * seed's schema. Deterministic for deterministic `step` (set
    * semantics: row order within rounds does not matter).
    */
  def iterate(seed: DataFrame, step: DataFrame => DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val spark = seed.sparkSession
    // The accumulated set is the UNION OF FRONTIER FILES, never rewritten:
    // frontiers are disjoint by construction (each is `except` everything
    // before it), so "all" is just a flat multi-scan over the round dirs —
    // no closure-sized union job per round. Per-round cost is exactly ONE
    // Spark job: the frontier's row count rides the materializing write as
    // an Observation, so the convergence check launches nothing.
    var frontier = Scratch.materialize(seed.distinct(), "fix_r0")._1
    var fronts = Vector(frontier)
    def all = fronts.reduce(_ union _)
    var round = 0
    var frontierRows = -1L // unknown for the seed round; probe lazily
    while (if (frontierRows >= 0) frontierRows > 0 else !frontier.isEmpty) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Fixpoint.iterate: no fixpoint within $maxRounds rounds — " +
            s"recursion deeper than the cap (or non-monotone step); " +
            s"raise maxRounds (a truncated closure would be WRONG)")
      // New frontier = step(frontier) minus everything already reached
      // (UNION-distinct semantics; `except` is distinct by definition).
      val obs = Observation()
      frontier = Scratch.materialize(
        step(frontier).except(all).observe(obs, count(lit(1)).as("n")),
        s"fix_r${round + 1}")._1
      frontierRows = obs.get("n").asInstanceOf[Long]
      if (frontierRows > 0) fronts :+= frontier
      round += 1
    }
    // Every file scanned by the returned plan is live — frontier dirs are
    // session scratch, reclaimed by the shutdown hook like every other
    // scratch-backed result.
    all
  }
}
