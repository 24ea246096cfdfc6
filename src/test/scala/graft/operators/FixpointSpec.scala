package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Semantics checks for the bounded fixpoint iterator. */
class FixpointSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("iterate computes the transitive closure of a reachability step") {
    import spark.implicits._
    // Two components: 1→2→3→4 (chain) and 10→11→10 (cycle); 20 isolated.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("u", "v")
    val seed = Seq(1L, 10L).toDF("x")
    val reached = Fixpoint.iterate(seed,
        d => d.join(edges, d("x") === edges("u")).select(col("v").as("x")))
      .collect().map(_.getLong(0)).toSet
    assert(reached == Set(1L, 2L, 3L, 4L, 10L, 11L))
  }

  test("iterate applies UNION-distinct semantics (cycles terminate)") {
    import spark.implicits._
    // Pure 3-cycle: naive accumulation would loop forever; set semantics
    // reach the fixpoint in 3 rounds.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("u", "v")
    val seed = Seq(0L).toDF("x")
    val reached = Fixpoint.iterate(seed,
        d => d.join(edges, d("x") === edges("u")).select(col("v").as("x")),
        maxRounds = 10)
      .collect().map(_.getLong(0)).toSet
    assert(reached == Set(0L, 1L, 2L))
  }

  test("iterate throws at the round cap instead of returning a truncated closure") {
    import spark.implicits._
    val seed = Seq(0L).toDF("x")
    val ex = intercept[IllegalStateException](
      Fixpoint.iterate(seed, d => d.select((col("x") + 1).as("x")), maxRounds = 5)
        .collect())
    assert(ex.getMessage.contains("no fixpoint within 5 rounds"))
  }

  test("iterate on an empty seed returns the empty set") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("x")
    assert(Fixpoint.iterate(empty, d => d.select((col("x") + 1).as("x"))).count() == 0)
  }
}
