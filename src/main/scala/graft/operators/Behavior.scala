package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: cohort retention and
  * ordered conversion funnels — the reporting workloads an events table
  * exists for (cf. the reference's events scripts: hourly rollups,
  * sessionization, attribution — retention and funnels are the next two
  * questions every one of those dashboards asks).
  */
object Behavior {

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * event; for each (cohort_week, week_offset), how many of that
    * cohort's users were active `week_offset` weeks later. The classic
    * retention triangle — offset 0 is the cohort size, the decay across
    * offsets is the retention curve.
    *
    * Scale shape: three hash aggregations and one join, ALL keyed on
    * user_id (or derived from a user-keyed result) — one logical
    * partitioning carried through: (1) min(ts) per user (map-side
    * combined), (2) distinct (user, week) activity (map-side combined),
    * (3) the user-keyed join of the two (co-partitioned — AQE needs no
    * broadcast), then the final fold to (cohort, offset) whose
    * cardinality is weeks², trivially small. Never a self-join of
    * events; cost is linear in events at any scale.
    *
    * Weeks are `date_trunc(week)` Mondays; offset is exact day-diff/7
    * (both week starts are Mondays, so the difference is always a
    * multiple of 7).
    *
    * Output: (cohort_week: date, week_offset: long, n_users: long).
    */
  def weeklyRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col("u"), date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val activity = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).cast("date").as("act_week"))
      .distinct()
    activity.join(firstSeen, Seq("u"))
      .select(col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      // activity is already distinct per (user, week): count(*) IS
      // distinct users — no second count-distinct expansion needed.
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered conversion funnel: per user, the earliest chain
    * step₁ < step₂ < ... < stepₖ with every later step inside
    * `windowDays` of the user's FIRST step₁ event. "Earliest chain" is
    * the standard greedy semantics: t₁ = min ts of step₁, tᵢ = min ts
    * of stepᵢ after tᵢ₋₁ (and ≤ t₁ + window) — greedy mins maximize
    * completion, so a user converts iff ANY ordered chain exists within
    * the window of their first entry.
    *
    * Scale shape: k−1 cascaded join+min aggregations, every one keyed
    * on user_id — the per-step frames are filtered projections of one
    * events scan, each join is co-partitioned on the same key (no
    * events self-join on time, no per-user sort, no window over the
    * corpus), and k is funnel length (3–5), a constant. State per step
    * is one timestamp per surviving user. AQE broadcasts later stages
    * as they shrink below the threshold.
    *
    * Output: one row per funnel step — (step_idx: long, step: string,
    * n_users: long), n_users non-increasing in step_idx.
    */
  def funnel(events: DataFrame, steps: Seq[String], windowDays: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byStep: String => DataFrame = s =>
      events.filter(col(typeCol) === s)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
    val first = byStep(steps.head).groupBy("u").agg(min("t").as("t1"))
      .withColumn("deadline", col("t1") + expr(s"INTERVAL $windowDays DAYS"))
    // reached(i) = users with a valid chain through step i, with the
    // chain's current timestamp — each iteration one co-partitioned
    // join + one map-side-combined min.
    val reached = steps.tail.scanLeft(first.withColumn("tc", col("t1"))) {
      (prev, step) =>
        byStep(step)
          .join(prev.select("u", "tc", "deadline"), Seq("u"))
          .filter(col("t") > col("tc") && col("t") <= col("deadline"))
          .groupBy("u").agg(min("t").as("t"))
          .join(prev.select("u", "deadline"), Seq("u"))
          .withColumn("tc", col("t"))
    }
    val countsDfs = reached.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step_idx"), lit(step).as("step"), col("n_users"))
    }
    countsDfs.reduce(_ unionByName _)
  }

  /** Within-session event-type transition counts — the Markov path
    * analysis (what users do next): for consecutive events inside one
    * [[sessionize]] session, count each (from_type, to_type) edge and
    * report its per-mille share of the from-type's outgoing mass.
    * Transitions never cross a session boundary (the lag restarts per
    * (user, session)), so "next" means next within the same visit.
    *
    * Scale shape: the sessionizing window plus ONE more lag over the
    * same (user-keyed) partitioning — Spark evaluates both window
    * specs in one Exchange; the transition fold is a map-side-combined
    * aggregate over the (typeCount²)-small edge set, and the share
    * join divides by the from-type totals (tiny, AQE broadcasts).
    *
    * Output: (from_type, to_type, n, share_millis).
    */
  def transitions(events: DataFrame, gapMinutes: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val sessioned = events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev_ts").isNull ||
        col(tsCol) > col("__prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
        .otherwise(0L))
      .withColumn("__sid", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol), col(idCol))
    val edges = sessioned
      .withColumn("from_type", lag(col(typeCol), 1).over(ws))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = edges.groupBy("from_type").agg(sum("n").as("tot"))
    edges.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        floor(col("n") * 1000.0 / col("tot")).cast("long").as("share_millis"))
  }

  /** Batch sessionization: split each user's event stream into sessions
    * at inactivity gaps larger than `gapMinutes` — the batch counterpart
    * of the streaming session windows (graft.streaming.EventsStreaming),
    * for backfills and historical re-sessionization. Boundary semantics
    * match the streaming form: a new session starts when the gap
    * STRICTLY exceeds the threshold.
    *
    * Scale shape: one window pass partitioned BY USER (hash-distributed
    * across executors — a per-user sort is events-per-user-sized, never
    * corpus-sized; this is what Window.partitionBy is for, unlike the
    * keyless global window the packing operator refuses), then one
    * map-side-combined aggregate per (user, session). Ordering ties on
    * ts break by the id column, so session numbering is deterministic.
    *
    * duration_secs is whole-second floor-diff (both engines' shared
    * convention: floor(epoch(end)) − floor(epoch(start))).
    *
    * Output: (user_id, session_id, n_events, start_ts, duration_secs).
    */
  def sessionize(events: DataFrame, gapMinutes: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsCol) > col("__prev") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
        .otherwise(0L))
      .withColumn("session_id", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol).as("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .cast("long").as("duration_secs"))
  }
}
