package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Similarity

/** A/B of the IVF codebook transports at large k — embedded-in-expression
  * reference objects vs a broadcast variable (BestCentroid vs
  * BestCentroidBroadcast, switched by `spark.graft.ivfBroadcastCodebookK`).
  * The kernel is identical; the claim under test is that moving a large
  * codebook out of the expression tree costs NO assignment wall time
  * while shrinking what every serialized stage carries (k·dim·4 bytes to
  * a broadcast handle). `sbt "runMain graft.tools.ProfileIvfK [n] [k]
  * [dim]"`, two timed runs per form (run2 = steady state).
  */
object ProfileIvfK {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val k = if (args.length > 1) args(1).toInt else 4096
    val dim = if (args.length > 2) args(2).toInt else 64
    val spark = Engine.session()
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_profivfk"
    val vecs = spark.range(n)
      .map(id => (id, Array.tabulate(dim)(i => (((id * 31 + i * 17) % 97) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    vecs.write.mode("overwrite").parquet(scratch)
    val corpus = spark.read.parquet(scratch)
    val centroids = corpus.filter(col("vec_id") < k)
    println(s"[ivfk] n=$n k=$k dim=$dim codebook=${k.toLong * dim * 4} bytes")
    // Pin the EXHAUSTIVE kernel: this tool A/Bs codebook TRANSPORT, and
    // at k past spark.graft.twoLevelAssignK (8192) both arms would
    // otherwise silently route to the two-level kernel, measuring
    // something else entirely.
    spark.conf.set("spark.graft.twoLevelAssignK", Int.MaxValue.toString)
    for (form <- Seq("embedded", "broadcast"); run <- 1 to 2) {
      spark.conf.set("spark.graft.ivfBroadcastCodebookK",
        if (form == "embedded") Int.MaxValue.toString else "1")
      val t0 = System.nanoTime()
      val chk = Similarity.assignToCentroids(corpus, centroids)
        .agg(sum("cid")).head().getLong(0)
      println(f"[ivfk] $form%-9s run$run ${(System.nanoTime() - t0) / 1e9}%8.2f s (checksum $chk)")
    }
    // PROBE-selection A/B (round 11): ivfTopK's query→cell step at the
    // same k — the q×k crossJoin+window (forced by pinning
    // twoLevelAssignK high) vs the row-local top_centroids_2level
    // expression (twoLevelAssignK below k). A large query batch is the
    // regime where the crossJoin shape hurts: q×k rows shuffled and
    // window-sorted to keep nProbe each.
    val queries = corpus.filter(col("vec_id") >= n - 2000)
    for (form <- Seq("crossjoin", "twolevel"); run <- 1 to 2) {
      spark.conf.set("spark.graft.twoLevelAssignK",
        if (form == "crossjoin") Int.MaxValue.toString else "64")
      val t0 = System.nanoTime()
      val cnt = Similarity.ivfTopK(corpus, queries, centroids, k = 10, nProbe = 4)
        .count()
      println(f"[ivfk] probe-$form%-10s run$run ${(System.nanoTime() - t0) / 1e9}%8.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
