package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Fixpoint

/** Per-round cost of Fixpoint.iterate vs bucket count, on the two regimes
  * the declared queries exercise: a tiny long-diameter graph (the nation
  * functional graph — ~25 rounds of 1-row frontiers, pure per-round fixed
  * cost) and a frontier-doubling tree (bulk work). Answers: how much of
  * the tiny-graph wall is the bucket fan-out of the round-table writes?
  */
object ProfileFixpoint {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fix] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = Engine.table(spark, sfDir, "nation")
    val edges = n.select(col("n_nationkey").cast("long").as("u"),
        ((col("n_nationkey") * 2 + 1) % 25).cast("long").as("v"))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 3 + 2) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 5 + 4) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 7 + 6) % 25).cast("long")))
    val seed = spark.range(1).select(lit(0L).as("x"))
    def run(buckets: Int): Long =
      Fixpoint.iterate(seed,
        d => d.join(edges, d("x") === edges("u")).select(col("v").as("x")),
        buckets = buckets).count()
    for (b <- Seq(32, 8, 4, 2); rep <- 1 to 2)
      time(s"nation graph, buckets=$b (rep $rep)")(run(b))

    val nNodes = 100000L
    val ids = spark.range(nNodes)
    val tree = ids.select(col("id").as("u"), (col("id") * 2 + 1).as("v"))
      .union(ids.select(col("id").as("u"), (col("id") * 2 + 2).as("v")))
      .filter(col("v") < nNodes)
    val (treeStored, _) = graft.operators.Scratch.materialize(tree, "pf_tree")
    def runTree(buckets: Int): Long =
      Fixpoint.iterate(spark.range(1).select(lit(0L).as("x")),
        d => d.join(treeStored, d("x") === treeStored("u")).select(col("v").as("x")),
        buckets = buckets).count()
    for (b <- Seq(32, 8)) time(s"100k tree, buckets=$b")(runTree(b))

    // Keyed fixpoint (iterateKeyed), the update-heavy regime: 100k keys
    // all upserted every round for 16 rounds — round tables are NOT
    // disjoint, so without compaction each round's lookup joins every
    // earlier 100k-row table (O(R²·K) scanned). A/B the compaction bound
    // (spark.graft.keyedFixpointCompactRounds: effectively-off vs the
    // default 8 vs aggressive 4).
    val kSeed = spark.range(100000).select(col("id").as("k"), lit(0L).as("v"))
    def runKeyed(compact: Int): Long = {
      spark.conf.set("spark.graft.keyedFixpointCompactRounds", compact.toString)
      try Fixpoint.iterateKeyed(kSeed,
        d => d.filter(col("v") < 16).select(col("k"), (col("v") + 1).as("v")),
        keys = Seq("k"), maxRounds = 24).count()
      finally spark.conf.unset("spark.graft.keyedFixpointCompactRounds")
    }
    for (c <- Seq(1000, 8, 4); rep <- 1 to 2)
      time(s"keyed upsert 100k x 16 rounds, compact=$c (rep $rep)")(runKeyed(c))
    spark.stop()
  }
}
