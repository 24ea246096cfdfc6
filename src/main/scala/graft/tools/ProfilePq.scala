package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Similarity

/** PQ scan-economics measurement: the claim under test is that a PQ
  * search scan reads m ids per vector instead of dim floats — a
  * storage/IO cut the brute-force path cannot match — and that IVF-PQ
  * prunes on top of it. Synthetic corpus (deterministic, same generator
  * family as ProfileIvfK), parquet-materialized so scan bytes are real
  * file bytes. `sbt "runMain graft.tools.ProfilePq [n] [dim] [m] [k]"`;
  * two timed runs per arm (run2 = steady state, parquet cache warm).
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val m = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 256
    val spark = Engine.session()
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_profpq"
    val vecs = spark.range(n)
      .map(id => (id, Array.tabulate(dim)(i =>
        (((id * 31 + i * 17) % 97) - 48 + (id % 13).toInt).toFloat)))
      .toDF("vec_id", "embedding")
    vecs.write.mode("overwrite").parquet(s"$base/embeddings")
    val corpus = spark.read.parquet(s"$base/embeddings")
    val cb = corpus.filter(col("vec_id") < k)
    val centroids = corpus.filter(col("vec_id") < 64)
    // Index build: ONE pass computing codes (and, for IVF-PQ, cid too).
    val t0 = System.nanoTime()
    Similarity.quantizePQ(corpus, cb, m)
      .write.mode("overwrite").parquet(s"$base/codes")
    println(f"[pq] code build (one pass, n=$n dim=$dim m=$m k=$k): ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) 0L else d.listFiles.filter(_.isFile).map(_.length).sum
    }
    val eb = dirBytes(s"$base/embeddings")
    val cbytes = dirBytes(s"$base/codes")
    println(f"[pq] stored bytes: embeddings $eb%,d vs codes $cbytes%,d (${eb.toDouble / cbytes}%.1f x smaller)")
    val codes = spark.read.parquet(s"$base/codes")
    val queries = corpus.filter(col("vec_id") >= n - 100)
    for (run <- 1 to 2) {
      var t = System.nanoTime()
      val b = Similarity.bruteForceTopK(corpus, queries, k = 10).count()
      println(f"[pq] brute (full-embedding scan)   run$run ${(System.nanoTime() - t) / 1e9}%8.2f s ($b rows)")
      t = System.nanoTime()
      val p = Similarity.pqTopK(codes, queries, cb, m, k = 10).count()
      println(f"[pq] pqTopK (codes-only scan)      run$run ${(System.nanoTime() - t) / 1e9}%8.2f s ($p rows)")
      t = System.nanoTime()
      val ip = Similarity.ivfPqTopK(corpus, queries, centroids, cb, m, k = 10, nProbe = 8)
        .count()
      println(f"[pq] ivfPqTopK (assign+code+probe) run$run ${(System.nanoTime() - t) / 1e9}%8.2f s ($ip rows)")
    }
    spark.stop()
  }
}
