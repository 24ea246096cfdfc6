package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded fixpoint iteration — the engine's answer to `WITH RECURSIVE`
  * (host surface the reference inherits from DuckDB; Spark has no general
  * recursion). Computes the least fixpoint of `seed UNION step(reached)`
  * with UNION-distinct semantics, exactly like a recursive CTE, by
  * SEMI-NAIVE iteration: `step` is applied only to each round's frontier
  * (the rows discovered last round), never to the whole accumulated set,
  * so round cost tracks the frontier, not the closure.
  *
  * Scale shape (same discipline as [[Dedup]]'s label propagation): every
  * round's accumulator and frontier are materialized to scratch parquet —
  * an un-truncated iterative plan doubles per round and overflows the
  * planner stack by ~round 9 — superseded rounds are reclaimed eagerly,
  * and `maxRounds` is a runaway-recursion cap that THROWS rather than
  * returning a truncated (wrong) closure. Transitive closures with the
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
    var (all, allDir) = Scratch.materialize(seed.distinct(), "fix_all")
    var frontier = all
    var frontierDir: String = null // round 0's frontier IS the seed set
    var round = 0
    var done = false
    while (!done) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Fixpoint.iterate: no fixpoint within $maxRounds rounds — " +
            s"recursion deeper than the cap (or non-monotone step); " +
            s"raise maxRounds (a truncated closure would be WRONG)")
      // New frontier = step(frontier) minus everything already reached
      // (UNION-distinct semantics; `except` is distinct by definition).
      val (nextFrontier, nextFrontierDir) =
        Scratch.materialize(step(frontier).except(all), "fix_delta")
      if (frontierDir != null) Scratch.delete(spark, frontierDir)
      frontier = nextFrontier; frontierDir = nextFrontierDir
      if (frontier.isEmpty) {
        Scratch.delete(spark, frontierDir)
        done = true
      } else {
        // Accumulate only on progress: the closing (empty) round leaves
        // `all` untouched instead of rewriting a closure-sized file.
        val (nextAll, nextAllDir) = Scratch.materialize(all.union(frontier), "fix_all")
        Scratch.delete(spark, allDir)
        all = nextAll; allDir = nextAllDir
        round += 1
      }
    }
    all
  }
}
