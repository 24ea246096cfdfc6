package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Semantics + plan-shape checks for the reusable as-of join. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100.0, "a"),
      (1L, 20L, 110.0, "b"),
      (1L, 30L, 120.0, "c"),
      (2L, 15L, 50.0, "d"))
      .toDF("sym", "qt", "px", "tag")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, 5L),   // before any quote
      (1L, 20L),  // exactly at quote b
      (1L, 25L),  // between b and c
      (2L, 99L),  // after d
      (3L, 10L))  // key with no quotes at all
      .toDF("sym", "tt")
  }

  test("inclusive as-of picks the latest right row at-or-before each left row") {
    val out = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("px", "tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 20L, 110.0, "b"), // equal instant matches inclusively
      (1L, 25L, 110.0, "b"),
      (2L, 99L, 50.0, "d")))
    // inner semantics: trade before any quote and keyless trade both drop.
  }

  test("strict as-of excludes right rows at the exact left instant") {
    val out = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("tag"), strict = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 20L, "a"), // quote b at t=20 is no longer visible under '<'
      (1L, 25L, "b"),
      (2L, 99L, "d")))
  }

  test("left as-of keeps unmatched rows with null payloads") {
    val out = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("tag"), inner = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out.contains((1L, 5L, None)) && out.contains((3L, 10L, None)))
    assert(out.size == 5)
  }

  test("as-of plan is linear: union + window, no join operator") {
    val plan = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not pair-inflate via a join:\n$plan")
    assert(plan.contains("Union") && plan.contains("Window"))
  }

  test("payload names clashing with left columns are rejected") {
    assertThrows[IllegalArgumentException](
      AsOfJoin.asofJoin(trades, quotes.withColumnRenamed("px", "tt"),
        on = "sym", leftOrder = "tt", rightOrder = "qt", payload = Seq("tt")))
  }

  test("forward as-of picks the earliest right row at-or-after each left row") {
    val out = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("px", "tag"),
        forward = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 5L, 100.0, "a"),
      (1L, 20L, 110.0, "b"), // equal instant matches inclusively
      (1L, 25L, 120.0, "c")))
    // Strict forward: the equal-instant quote is no longer visible.
    val strictOut = AsOfJoin.asofJoin(trades, quotes, on = "sym",
        leftOrder = "tt", rightOrder = "qt", payload = Seq("px", "tag"),
        strict = true, forward = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(strictOut == Set((1L, 5L, "a"), (1L, 20L, "c"), (1L, 25L, "c")))
  }

  test("property: random timelines match a brute-force argmax oracle in all four modes") {
    import spark.implicits._
    // Deterministic fuzzing (seeded, like SolverPropertySpec): random
    // timelines with hot keys, duplicate left instants, left rows exactly
    // at right instants (the tie edge), nullable payloads, and sides that
    // can be empty — checked against a per-left-row brute-force argmax
    // for every (strict × inner) combination. Right rows are unique per
    // (key, order): on a (key, order) tie the operator's pick is
    // contractually arbitrary, so only tie-free inputs have one oracle.
    val rnd = new scala.util.Random(20260812L)
    for (scenario <- 0 until 8) {
      val nLeft = if (scenario == 6) 0 else 1 + rnd.nextInt(40)
      val nRight = if (scenario == 7) 0 else 1 + rnd.nextInt(40)
      val keys = 1 + rnd.nextInt(4) // few keys -> hot keys + tie pressure
      val lefts = Seq.fill(nLeft)(
        (rnd.nextInt(keys).toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000)))
      val rights0 = Seq.fill(nRight)(
        (rnd.nextInt(keys).toLong, rnd.nextInt(20).toLong,
          if (rnd.nextInt(4) == 0) null else s"p${rnd.nextInt(100)}"))
      val rights = rights0.groupBy(t => (t._1, t._2)).values.map(_.head).toSeq
      val leftDf = lefts.toDF("k", "t", "tag")
      val rightDf = rights.toDF("k", "rt", "pay")
      for (strict <- Seq(false, true); inner <- Seq(false, true);
           forward <- Seq(false, true)) {
        val got = AsOfJoin.asofJoin(leftDf, rightDf, on = "k",
            leftOrder = "t", rightOrder = "rt", payload = Seq("pay"),
            strict = strict, inner = inner, forward = forward)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), Option(r.getString(3))))
          .sortBy(x => (x._1, x._2, x._3, x._4))
        val expected = lefts.flatMap { case (k, t, tag) =>
          val cand = rights.filter(r => r._1 == k && {
            if (forward) { if (strict) r._2 > t else r._2 >= t }
            else { if (strict) r._2 < t else r._2 <= t }
          })
          if (cand.isEmpty) {
            if (inner) None else Some((k, t, tag, None: Option[String]))
          } else Some((k, t, tag, Option(
            (if (forward) cand.minBy(_._2) else cand.maxBy(_._2))._3)))
        }.sortBy(x => (x._1, x._2, x._3, x._4))
        assert(got.toSeq == expected,
          s"scenario=$scenario strict=$strict inner=$inner forward=$forward " +
            s"keys=$keys nLeft=$nLeft nRight=${rights.size}")
      }
    }
  }
}
