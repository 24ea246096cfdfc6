package graft.tools

/** Measures what referencing `__recurring` (DuckDB's `recurring.<name>`
  * accumulated state) adds to a keyed fixpoint round — the state resolve
  * is a lazy thunk (Fixpoint.iterateKeyedWithState), so the question is
  * the marginal cost when a step DOES use it: one latest-per-key K-row
  * shuffle per round over the compaction-bounded round tables.
  *
  * Usage: `sbt "runMain graft.tools.ProfileRecurring [keys...]"`
  * (defaults 10000 100000). Each cell runs the same 8-round all-keys-
  * change fixpoint twice — plain frontier step vs the same step plus a
  * scalar subquery over __recurring that cannot change values
  * (`+ (SELECT max(v) - max(v) FROM __recurring)`) — and prints both
  * wall times. Results identical by construction; asserted.
  */
object ProfileRecurring {

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10000, 100000)
    def run(n: Int, step: String): (Double, Long) = {
      spark.range(n.toLong).selectExpr("id AS k", "0L AS v")
        .createOrReplaceTempView("pr_seed")
      val t0 = System.nanoTime()
      val rows = spark.sql(
        s"SELECT count(*) AS c, sum(v) AS s FROM fixpoint_keyed('pr_seed', '$step', 'k')")
        .head()
      ((System.nanoTime() - t0) / 1e9, rows.getLong(1))
    }
    sizes.foreach { n =>
      // Warm both plan shapes once at a tiny size to exclude first-touch.
      run(64, "SELECT k, v + 1 FROM __frontier WHERE v < 2")
      run(64, "SELECT k, v + 1 + (SELECT max(v) - max(v) FROM __recurring) " +
        "FROM __frontier WHERE v < 2")
      val (tPlain, sPlain) =
        run(n, "SELECT k, v + 1 FROM __frontier WHERE v < 8")
      val (tRec, sRec) =
        run(n, "SELECT k, v + 1 + (SELECT max(v) - max(v) FROM __recurring) " +
          "FROM __frontier WHERE v < 8")
      require(sPlain == sRec && sPlain == 8L * n,
        s"result drift: plain=$sPlain recurring=$sRec expected=${8L * n}")
      println(f"""{"keys":$n,"rounds":8,"plain_sec":$tPlain%.2f,"recurring_sec":$tRec%.2f,"overhead_per_round_sec":${(tRec - tPlain) / 8}%.3f}""")
    }
    spark.stop()
  }
}
