package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine

/** Round-20 scale probes (verdict-19 #7): the two round-19/20 surfaces
  * SCALE.md's ×100 curves predate.
  *
  *  - `grid <sfDir> <factor>` — the ANN shortlist path at ×factor
  *    corpus: the grid lane itself is a bounded report, but its ADC
  *    scan is corpus-sized, so this probes ivfPqRerankTopK at the
  *    grid's deepest point (shortlist=200, nProbe=16, k=10) over a
  *    ×factor clone of the embeddings table. Two timed runs (first
  *    carries codebook build + JIT), peak scratch reported.
  *  - `lazyappend <n>` — an n-statement (default 64) pure-VALUES
  *    INSERT script against a graft temp table: the round-19 lazy
  *    union appends metadata-only until the depth-32 cap forces a
  *    materializing flush — per-statement wall times expose the two
  *    flushes a 64-statement script pays and their cost vs the
  *    metadata appends.
  *  - `walk <sfDir> <factor>` — graph-walk ANN (round-20 operator) at
  *    ×factor: exact-graph build is oracle-bounded in the lane, so the
  *    probe walks the IVF kNN graph (sim_knn_graph's production
  *    pairing) over the cloned corpus.
  *
  * `sbt "runMain graft.tools.ProfileRound20 <mode> ..."`.
  */
object ProfileRound20 {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "grid"
    mode match {
      case "grid" => grid(
        if (args.length > 1) args(1) else "/root/testdata/sf0.1",
        if (args.length > 2) args(2).toInt else 20)
      case "lazyappend" => lazyAppend(
        if (args.length > 1) args(1).toInt else 64)
      case "walk" => walk(
        if (args.length > 1) args(1) else "/root/testdata/sf0.1",
        if (args.length > 2) args(2).toInt else 20)
      case other => sys.error(s"unknown mode $other")
    }
  }

  private def session(scratch: String) = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.scratchDir", scratch)
    spark
  }

  private def dirMb(p: String): Double = {
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      else f.length
    size(new java.io.File(p)) / 1e6
  }

  private def cloneEmbeddings(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, factor: Int, dir: String) = {
    val e = Engine.table(spark, sfDir, "embeddings")
    val off = e.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) e
      else e.select((col("vec_id") + lit(k * off)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def grid(sfDir: String, factor: Int): Unit = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_prof20"
    val spark = session(scratch)
    val big = cloneEmbeddings(spark, sfDir, factor, s"$scratch/gridvecs")
    println(s"[r20 grid] vectors ${factor}x=${big.count()}")
    val queries = big.filter(col("vec_id") < 5)
    val centroids = big.filter(col("vec_id") < 16)
    val cb = big.filter(col("vec_id") < 64)
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.ivfPqRerankTopK(big, queries,
        centroids, cb, m = 4, k = 10, nProbe = 16, shortlist = 200).count()
      println(f"[r20 grid run$run ${factor}x] shortlist200 n=$n%d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s scratch=${dirMb(scratch)}%.0f MB")
    }
    spark.stop()
  }

  private def walk(sfDir: String, factor: Int): Unit = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_prof20w"
    val spark = session(scratch)
    val big = cloneEmbeddings(spark, sfDir, factor, s"$scratch/walkvecs")
    println(s"[r20 walk] vectors ${factor}x=${big.count()}")
    val centroids = big.filter(col("vec_id") < 16)
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val graph = graft.operators.Similarity.knnGraph(big, centroids,
        k = 5, nProbe = 4)
      val (gmat, _) = graft.operators.Scratch.materialize(graph, "prof20_graph")
      val tGraph = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = graft.operators.Similarity.graphWalkTopK(big, gmat,
        big.filter(col("vec_id") < 8), k = 5, beam = 16, rounds = 3,
        entries = 4).count()
      println(f"[r20 walk run$run ${factor}x] graph=$tGraph%.1f s " +
        f"walk n=$n%d ${(System.nanoTime() - t1) / 1e9}%.1f s " +
        f"scratch=${dirMb(scratch)}%.0f MB")
    }
    spark.stop()
  }

  private def lazyAppend(n: Int): Unit = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_prof20la"
    val spark = session(scratch)
    spark.sql("CREATE OR REPLACE TEMP TABLE prof20_la (k INT, v VARCHAR)")
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      spark.sql(s"INSERT INTO prof20_la VALUES ($i, 'row$i')").collect()
      (i, (System.nanoTime() - t0) / 1e3) // µs
    }
    val total = spark.sql("SELECT count(*) c FROM prof20_la").head().getLong(0)
    val sorted = times.map(_._2).sorted
    val spikes = times.filter(_._2 > 4 * sorted(n / 2))
    println(f"[r20 lazyappend] n=$n rows=$total " +
      f"median=${sorted(n / 2) / 1000}%.1f ms p90=${sorted((n * 9) / 10) / 1000}%.1f ms " +
      f"max=${sorted.last / 1000}%.1f ms " +
      s"spikes(>4x med)=${spikes.map(s => s"#${s._1}@${(s._2 / 1000).toInt}ms").mkString(",")} " +
      f"scratch=${dirMb(scratch)}%.0f MB")
    val t0 = System.nanoTime()
    val cnt = spark.sql("SELECT count(*) c FROM prof20_la").head().getLong(0)
    println(f"[r20 lazyappend] final-read count=$cnt ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
