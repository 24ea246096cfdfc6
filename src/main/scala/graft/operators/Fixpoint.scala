package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions.{col, count, lit, struct, xxhash64}

/** Bounded fixpoint iteration — the engine's answer to `WITH RECURSIVE`
  * (host surface the reference inherits from DuckDB; Spark has no general
  * recursion). Computes the least fixpoint of `seed UNION step(reached)`
  * with UNION-distinct semantics, exactly like a recursive CTE, by
  * SEMI-NAIVE iteration: `step` is applied only to each round's frontier
  * (the rows discovered last round), never to the whole accumulated set,
  * so step cost tracks the frontier, not the closure.
  *
  * Scale shape (same discipline as [[Dedup]]'s label propagation): every
  * round's frontier is materialized — an un-truncated iterative plan
  * doubles per round and overflows the planner stack by ~round 9 — and
  * `maxRounds` is a runaway-recursion cap that THROWS rather than
  * returning a truncated (wrong) closure.
  *
  * The dedup side ("new frontier = step(frontier) minus everything
  * reached") is where a naive `except(reached-so-far)` costs
  * O(rounds × closure) in SHUFFLE: `except` hash-shuffles BOTH sides on
  * every column, so each round re-shuffles the entire accumulated
  * closure. Here each frontier is instead persisted as a BUCKETED,
  * bucket-sorted table keyed by a row hash (`xxhash64` of the whole row),
  * written with exactly one file per bucket, and the dedup is a chain of
  * co-located left-anti sort-merge joins over those tables: every reached
  * table is read already partitioned (bucket metadata) and already sorted
  * (one file per bucket), so the closure side incurs a columnar SCAN but
  * ZERO exchange and ZERO sort, every round. Per-round shuffled bytes are
  * O(|frontier|) — the candidates' distinct + one alignment to the bucket
  * layout — which is the semi-naive ideal; the per-round closure scan is
  * the irreducible cost of exact set semantics without an index.
  * (Plan-asserted in FixpointSpec: reached-table scans are bucketed and no
  * exchange sits above them.) Transitive closures with the
  * diameter-halving trick live in [[Dedup.componentLabels]]; this is the
  * general tool for everything else a recursive CTE would express
  * (reachability, bill-of-materials, org rollups).
  */
object Fixpoint {

  private val H = "__gfp_h"

  /** Left-anti join of `cand` (carrying [[H]]) against one reached table,
    * equi-keyed ONLY on the row hash, with the exact null-safe whole-row
    * comparison as the residual condition (hash collisions must not drop
    * genuinely-new rows).
    *
    * The key set matters: if the whole-row `<=>` were left as a bare
    * conjunct, ExtractEquiJoinKeys would pull it into the join keys as
    * coalesce/isnull pairs — expressions the bucketed scan's sort order
    * can't satisfy — and the planner would re-SORT the entire reached
    * table every round. Wrapping it as `rowEq OR h≠h` makes the conjunct
    * a disjunction (not an extractable equality) without changing its
    * value — the key already enforces h=h, so the OR's right arm is
    * always false on joined pairs — so the row check stays a residual
    * filter, the keys stay `[h]`, and the reached side's bucket layout
    * satisfies the join's distribution AND ordering untouched: zero
    * exchange, zero sort, every round.
    */
  private[operators] def antiReached(cand: DataFrame, reached: DataFrame,
      cols: Seq[String]): DataFrame = {
    val c = cand.alias("__gfc")
    val r = reached.alias("__gfr")
    val hEq: Column = col(s"__gfc.$H") === col(s"__gfr.$H")
    val rowEq: Column =
      struct(cols.map(n => col(s"__gfc.$n")): _*) <=>
        struct(cols.map(n => col(s"__gfr.$n")): _*)
    c.join(r, hEq && (rowEq || col(s"__gfc.$H") =!= col(s"__gfr.$H")), "left_anti")
  }

  /** Persist `df` (original columns + [[H]]) as a bucketed-by-hash,
    * bucket-sorted table with ONE file per bucket (the explicit
    * repartition puts each bucket's rows in exactly one task, and the
    * repartition key is the same murmur3-mod the bucketed writer uses, so
    * the writer emits one file per bucket — the single-file-per-bucket
    * layout is what lets later scans report their sort order and skip the
    * merge-join sort). The table is EXTERNAL with its data under the
    * session scratch root: the files are reclaimed by [[Scratch]]'s
    * shutdown hook, and the catalog entry lives only as long as the
    * session (in-memory catalog) or is harmless metadata (Hive).
    */
  private[operators] def persistFrontier(df: DataFrame, name: String, buckets: Int,
      path: String = null): DataFrame = {
    val spark = df.sparkSession
    val dir = if (path == null) Scratch.freshDir(spark, name) else path
    df.repartition(buckets, col(H))
      .write
      .bucketBy(buckets, H)
      .sortBy(H)
      .option("path", dir)
      .format("parquet")
      .saveAsTable(name)
    spark.table(name)
  }

  /** On-disk bytes of a persisted frontier dir — driver-side metadata
    * only (one FileSystem call), the measured input to the adaptive
    * bucket sizing below.
    */
  private def dirBytes(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  /** Bytes-derived bucket count for the round tables when the caller did
    * not size them (buckets = 0) — guide-§2 scale-adaptive partitioning:
    * a constant `spark.sql.shuffle.partitions` fan-out pays one write
    * task + one file PER BUCKET PER ROUND regardless of frontier size
    * (measured: the 25-round nation closure runs 1.4-2x slower at 32
    * buckets than at 4, ProfileFixpoint), while a 100 TB closure wants
    * buckets sized like any shuffle. `ceil(bytes / targetBucketBytes)`
    * clamped to [1, spark.sql.shuffle.partitions]; the ceiling keeps a
    * deployment's configured width as the upper bound (a cluster raises
    * shuffle.partitions, and the cap rises with it), the 128 MB default
    * target follows the healthy-partition guidance and is overridable
    * via spark.graft.fixpoint.targetBucketBytes. Round r+1 is sized from
    * round r's MEASURED bytes (one-round lag; a growing frontier is
    * corrected the next round, and the clamp bounds the error), the seed
    * round from the optimizer's size estimate (clamped the same way, so
    * a garbage estimate degrades to today's constant, never worse).
    * Rounds may therefore differ in bucket count: the anti-join chain
    * stays correct (each join is keyed on [[H]] regardless of layout),
    * every reached-side scan is still bucketed and sort-satisfying, and
    * any side a width change forces Spark to re-exchange is small by
    * construction (it was persisted when the frontier was that size).
    */
  private def adaptiveBuckets(bytes: Long, cap: Int, targetBytes: Long): Int =
    math.max(1L, math.min(cap.toLong,
      (bytes / targetBytes) + (if (bytes % targetBytes == 0) 0 else 1))).toInt

  /** The accumulated distinct row set of `seed ∪ step(frontier₀) ∪ …`,
    * iterated until a round adds nothing new. `step` must return the
    * seed's schema. Deterministic for deterministic `step` (set
    * semantics: row order within rounds does not matter).
    *
    * `buckets` > 0 pins the reached tables' bucket layout for every
    * round; the default (0) sizes each round adaptively from measured
    * frontier bytes (see [[adaptiveBuckets]]) — closure size / healthy
    * partition size, capped at `spark.sql.shuffle.partitions`.
    */
  def iterate(seed: DataFrame, step: DataFrame => DataFrame,
      maxRounds: Int = 64, buckets: Int = 0): DataFrame = {
    val spark = seed.sparkSession
    val cols = seed.columns.toIndexedSeq
    require(cols.nonEmpty, "Fixpoint.iterate: seed must have at least one column")
    val cap = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val targetBytes = spark.conf.getOption("spark.graft.fixpoint.targetBucketBytes")
      .map(_.toLong).getOrElse(128L << 20)
    // Next round's bucket count: explicit `buckets` wins; else derived
    // from the previous persisted frontier's measured bytes (seed round:
    // the optimizer's estimate) — see adaptiveBuckets.
    var nextNb =
      if (buckets > 0) buckets
      else adaptiveBuckets(
        seed.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong, cap, targetBytes)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    def tableName(round: Int) = s"graft_fix_${runId}_r$round"
    def withHash(df: DataFrame): DataFrame =
      df.withColumn(H, xxhash64(struct(cols.map(col): _*)))
    var created = Vector.empty[String]
    def persist(df: DataFrame, round: Int): DataFrame = {
      val name = tableName(round)
      val dir = Scratch.freshDir(spark, name)
      val out = persistFrontier(df, name, nextNb, dir)
      if (buckets <= 0)
        nextNb = adaptiveBuckets(dirBytes(spark, dir), cap, targetBytes)
      created :+= name
      out
    }
    // Tables are catalog entries only while the iteration needs them for
    // name resolution; Datasets analyze eagerly, so once every round's
    // frame exists the entries can be dropped (they are EXTERNAL — the
    // parquet stays, owned by the session scratch root) and nothing leaks
    // into the catalog across calls.
    def dropCreated(): Unit = created.foreach(n =>
      try { spark.sql(s"DROP TABLE IF EXISTS $n"); () }
      catch { case _: Exception => () })
    try {
      // Frontier tables are disjoint by construction (each round's rows are
      // anti-joined against every earlier table), so the accumulated set is
      // the flat union of the round tables — nothing is ever rewritten;
      // total storage = one copy of the closure.
      var frontier = persist(withHash(seed.distinct()), 0)
      var reached = Vector(frontier)
      var round = 0
      var frontierRows = -1L // unknown for the seed round; probe lazily
      while (if (frontierRows >= 0) frontierRows > 0 else !frontier.isEmpty) {
        if (round >= maxRounds)
          throw new IllegalStateException(
            s"Fixpoint.iterate: no fixpoint within $maxRounds rounds — " +
              s"recursion deeper than the cap (or non-monotone step); " +
              s"raise maxRounds (a truncated closure would be WRONG)")
        // New frontier = step(frontier) minus everything already reached
        // (UNION-distinct semantics). The candidates' distinct and the
        // anti-join chain below are the round's only shuffles — both
        // frontier-sized; the reached tables stream through co-located,
        // pre-sorted merge joins. The frontier row count rides the
        // materializing write as an Observation, so the convergence check
        // launches nothing.
        val cand = withHash(step(frontier.drop(H)).distinct())
        val fresh = reached.foldLeft(cand)((c, r) => antiReached(c, r, cols))
        val obs = Observation()
        frontier = persist(fresh.observe(obs, count(lit(1)).as("n")), round + 1)
        // Same defense as iterateKeyed: AQE runtime empty-propagation can
        // collapse a runtime-empty round's plan and lose the
        // CollectMetrics observation (observed there on the convergence
        // round's outer joins; never yet on this anti-join chain, but the
        // rule set is Spark's to change). The persisted table is ground
        // truth — probe it if "n" went missing.
        frontierRows = {
          val m = obs.getAsJava
          if (m.containsKey("n")) m.get("n").asInstanceOf[Long]
          else spark.table(tableName(round + 1)).count()
        }
        if (frontierRows > 0) reached :+= frontier
        round += 1
      }
      // Every file scanned by the returned plan is live for the session;
      // it is session scratch, reclaimed by the shutdown hook like every
      // other scratch-backed result.
      reached.map(_.drop(H)).reduce(_ union _)
    } finally dropCreated()
  }

  /** KEYED fixpoint — DuckDB's `WITH RECURSIVE ... USING KEY` semantics
    * (DuckDB ≥1.3 docs; the reference host's dialect): the state table
    * holds ONE row per key; each round's step output UPSERTS it (new key
    * → insert, existing key with a different payload → replace,
    * identical row → no-op), the step sees exactly the rows that CHANGED
    * state last round (DuckDB's intermediate table), and iteration stops
    * when a round changes nothing. `maxRounds` throws on non-convergence
    * (an oscillating step — key flipping between payloads — is a bug in
    * the step, and a truncated state would be WRONG).
    *
    * Where DuckDB's row-order-dependent "last row wins" resolves
    * duplicate keys WITHIN one round arbitrarily, a distributed engine
    * must be deterministic: the MINIMUM full-row struct wins
    * (engine-defined tie-break, like the as-of join's tie contract).
    *
    * Scale shape mirrors [[iterate]]: each round's changed set persists
    * as a bucketed, bucket-sorted table keyed by the KEY hash, the
    * current-payload lookup is a chain of co-located left joins against
    * those tables (zero exchange, zero sort on the state side — the
    * `keyEq || h≠h` disjunction keeps the null-safe key check a residual
    * instead of a sort-breaking extracted join key, as in
    * [[antiReached]]), and per-round shuffled bytes are O(|changed|).
    * A replaced key's old row stays in its old round table; LATER ROUNDS
    * TAKE PRECEDENCE — resolved per lookup via reverse-round coalesce
    * and once at the end via max_by(round) per key.
    *
    * Where keyed state DIFFERS from [[iterate]]'s closure: update-heavy
    * workloads re-touch keys, so round tables are NOT disjoint —
    * unboundedly many superseded rows would accumulate and every
    * lookup's join chain would grow one table per round (O(rounds²·K)
    * scanned over a long run). Past
    * `spark.graft.keyedFixpointCompactRounds` live tables (default 8)
    * the state COMPACTS: latest-per-key resolves into one bucketed
    * table and iteration continues from it — lookups join ≤ compact+1
    * tables, superseded rows are dropped rather than re-scanned forever,
    * and one K-row shuffle per compaction pays for it. ([[iterate]]
    * needs no such step: its round tables are disjoint by construction,
    * so its chain scans each closure row exactly once per round.)
    */
  def iterateKeyed(seed: DataFrame, step: DataFrame => DataFrame,
      keys: Seq[String], maxRounds: Int = 64, buckets: Int = 0): DataFrame =
    iterateKeyedWithState(seed, (frontier, _) => step(frontier),
      keys, maxRounds, buckets)

  /** [[iterateKeyed]] plus DuckDB's `recurring.<name>` relation: the step
    * also receives a THUNK of the accumulated one-row-per-key state as of
    * the round's start (seed + every upsert through the previous round —
    * exactly DuckDB's recurring table). A thunk because resolving it
    * costs a K-row per-key shuffle over the (compaction-bounded) round
    * tables; steps that ignore it — most — never pay.
    */
  def iterateKeyedWithState(seed: DataFrame,
      step: (DataFrame, () => DataFrame) => DataFrame,
      keys: Seq[String], maxRounds: Int = 64, buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, max_by, min, struct => fstruct}
    val spark = seed.sparkSession
    val cols = seed.columns.toIndexedSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"Fixpoint.iterateKeyed: keys ${keys.mkString(",")} must be seed columns ${cols.mkString(",")}")
    val cap = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val targetBytes = spark.conf.getOption("spark.graft.fixpoint.targetBucketBytes")
      .map(_.toLong).getOrElse(128L << 20)
    var nextNb =
      if (buckets > 0) buckets
      else adaptiveBuckets(
        seed.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong, cap, targetBytes)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    def tableName(round: Int) = s"graft_kfix_${runId}_r$round"
    def withKeyHash(df: DataFrame): DataFrame =
      df.withColumn(H, xxhash64(fstruct(keys.map(col): _*)))
    // Deterministic one-row-per-key: minimum full-row struct wins.
    def dedupByKey(df: DataFrame): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(min(fstruct(cols.map(col): _*)).as("__gkf_row"))
        .select(cols.map(c => col(s"__gkf_row.$c")): _*)
    // Latest-per-key resolution over ordered state tables (later index
    // supersedes) — the shape both the final result and compaction use;
    // deterministic because (key, table index) is unique.
    def resolveLatest(tables: Vector[DataFrame]): DataFrame = {
      val tagged = tables.zipWithIndex.map { case (r, i) =>
        r.drop(H).withColumn("__gkf_round", lit(i)) }
      tagged.reduce(_ union _)
        .groupBy(keys.map(col): _*)
        .agg(max_by(fstruct(cols.map(col): _*), col("__gkf_round")).as("__gkf_row"))
        .select(cols.map(c => col(s"__gkf_row.$c")): _*)
    }
    val compactEvery = spark.conf
      .getOption("spark.graft.keyedFixpointCompactRounds").map(_.toInt).getOrElse(8)
    require(compactEvery >= 1,
      "spark.graft.keyedFixpointCompactRounds must be >= 1")
    var created = Vector.empty[String]
    def persist(df: DataFrame, name: String): DataFrame = {
      val dir = Scratch.freshDir(spark, name)
      val out = persistFrontier(df, name, nextNb, dir)
      if (buckets <= 0)
        nextNb = adaptiveBuckets(dirBytes(spark, dir), cap, targetBytes)
      created :+= name
      out
    }
    def dropCreated(): Unit = created.foreach(n =>
      try { spark.sql(s"DROP TABLE IF EXISTS $n"); () }
      catch { case _: Exception => () })
    try {
      var frontier = persist(withKeyHash(dedupByKey(seed)), tableName(0))
      var reached = Vector(frontier) // round order; later rounds supersede
      var round = 0
      var frontierRows = -1L
      while (if (frontierRows >= 0) frontierRows > 0 else !frontier.isEmpty) {
        if (round >= maxRounds)
          throw new IllegalStateException(
            s"Fixpoint.iterateKeyed: no fixpoint within $maxRounds rounds — " +
              "non-convergent step (oscillating payloads?) or recursion " +
              "deeper than the cap; raise maxRounds (truncated state would be WRONG)")
        // Recursive-CTE column semantics are POSITIONAL, and the SEED
        // anchors both names and types (DuckDB's contract): rename by
        // position and cast to the seed's types — a step that widens a
        // column (int seed, bigint step) would otherwise fail the final
        // round-table union, and the per-round key-hash equality relies
        // on consistent types across rounds. ANSI mode makes a genuinely
        // incompatible step type a loud error, not a silent null.
        val stepped = step(frontier.drop(H), () => resolveLatest(reached))
        require(stepped.columns.length == cols.length,
          s"Fixpoint.iterateKeyed: step returned ${stepped.columns.length} " +
            s"columns, seed has ${cols.length}")
        val seedTypes = seed.schema.fields.map(_.dataType)
        val cand = withKeyHash(dedupByKey(
          stepped.toDF(cols: _*).select(cols.zip(seedTypes).map {
            case (c, t) => col(c).cast(t).as(c) }.toIndexedSeq: _*)))
        // Current payload per candidate key: left-join every round table
        // (each holds ≤1 row per key) on the key hash with the null-safe
        // key struct as a residual, collecting one payload struct per
        // round; the LATEST round's match wins via reverse coalesce.
        val keyStructC = fstruct(keys.map(col): _*)
        var joined = cand
        reached.zipWithIndex.foreach { case (r, i) =>
          val ri = r.select(col(H).as(s"__gkf_h$i"),
            fstruct(keys.map(col): _*).as(s"__gkf_k$i"),
            fstruct(cols.map(col): _*).as(s"__gkf_cur$i"))
          val hEq = col(H) === col(s"__gkf_h$i")
          val kEq = keyStructC <=> col(s"__gkf_k$i")
          joined = joined
            .join(ri, hEq && (kEq || col(H) =!= col(s"__gkf_h$i")), "left")
            .drop(s"__gkf_h$i", s"__gkf_k$i")
        }
        val latest = coalesce(reached.indices.reverse.map(i => col(s"__gkf_cur$i")): _*)
        val rowStruct = fstruct(cols.map(col): _*)
        val changed = joined
          .filter(latest.isNull || !(rowStruct <=> latest))
          .select((cols :+ H).map(col): _*)
        val obs = Observation()
        frontier = persist(changed.observe(obs, count(lit(1)).as("n")),
          tableName(round + 1))
        // When a round's cand turns out empty at RUNTIME, AQE's
        // empty-relation propagation can collapse the outer-join tree
        // and the CollectMetrics observation is lost with it (the
        // metrics map comes back without "n" — seen deterministically on
        // the convergence round). The persisted table is the ground
        // truth either way: probe it on metric loss — one tiny job, and
        // only on the (usually final) metric-less round.
        frontierRows = {
          val m = obs.getAsJava
          if (m.containsKey("n")) m.get("n").asInstanceOf[Long]
          else spark.table(tableName(round + 1)).count()
        }
        if (frontierRows > 0) reached :+= frontier
        // Compaction: bound the lookup chain and drop superseded rows
        // (see the scaladoc). The frontier table itself is untouched —
        // only the STATE view of it merges into the compacted table.
        if (reached.length > compactEvery)
          reached = Vector(persist(withKeyHash(resolveLatest(reached)),
            s"graft_kfix_${runId}_c$round"))
        round += 1
      }
      // Final state: per key, the row from the latest table that touched
      // it — one key-hash shuffle over the (compaction-bounded) union.
      resolveLatest(reached)
    } finally dropCreated()
  }
}
