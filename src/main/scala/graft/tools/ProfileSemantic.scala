package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Similarity

/** Isolated wall-clock for the cluster-scoped semantic dedup at a
  * synthesis factor (the ScaleProbe embedding corpus, nothing else in the
  * JVM — the measurement-of-record loop, like ProfileSpan for span dedup):
  * `sbt "runMain graft.tools.ProfileSemantic <sfDir> <factor> [k]"`, two
  * timed runs (run2 = steady state).
  *
  * The optional explicit `k` exercises the codebook regimes: k past
  * `spark.graft.ivfBroadcastCodebookK` (1024) takes the DISTRIBUTED
  * k-means path (bucket-mean init, Aggregator means, parquet-backed
  * codebook) — the SemDeDup 100 TB contract where k ≈ N/clusterSize.
  * Post-GC driver heap prints per run: at k=10⁴ it must stay flat vs the
  * k=N/500 default, since nothing k-sized persists on the driver beyond
  * the transient per-iteration assignment broadcast.
  *
  * A 4th arg `exhaustive` pins `spark.graft.twoLevelAssignK` past any k,
  * forcing the O(k)-per-row exhaustive assignment kernel — the A/B arm
  * against the default two-level (coarse→fine) assignment that engages
  * above k=8192.
  */
object ProfileSemantic {
  private def usedHeapMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
  }

  /** Samples used heap every 50 ms on a daemon thread — the post-GC
    * number proves no k-sized structure PERSISTS, the peak bounds the
    * per-iteration TRANSIENT (the collected codebook Row array + the
    * two-level broadcast build) the flat floor can't see.
    */
  private final class PeakSampler extends Thread {
    setDaemon(true)
    @volatile var peakMb: Long = 0L
    @volatile private var running = true
    override def run(): Unit = {
      val rt = Runtime.getRuntime
      while (running) {
        val used = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
        if (used > peakMb) peakMb = used
        Thread.sleep(50)
      }
    }
    def stopSampling(): Long = { running = false; peakMb }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val kOverride = if (args.length > 2) Some(args(2).toInt) else None
    val exhaustive = args.length > 3 && args(3) == "exhaustive"
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profsem"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    if (exhaustive) spark.conf.set("spark.graft.twoLevelAssignK", Int.MaxValue.toString)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val emb = Engine.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val eoff = emb.agg(max("vec_id")).head().getLong(0) + 1
    val big = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + lit(k * eoff)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit((k * 0.003).toFloat)).cast("float")).as("embedding"))
    }.reduce(_ union _)
    val dir = s"$scratchBase/embeddings"
    big.write.mode("overwrite").parquet(dir)
    val vectors = spark.read.parquet(dir)
    val n = vectors.count()
    val k = kOverride.getOrElse(math.max(16, (n / 500).toInt))
    val twoLevelK = spark.conf.getOption("spark.graft.twoLevelAssignK")
      .map(_.toInt).getOrElse(8192)
    val distributedK = spark.conf.getOption("spark.graft.kmeansDistributedK")
      .map(_.toInt).getOrElse(1024)
    println(s"[sem] corpus = $n vectors, k = $k " +
      s"(${if (k > distributedK) "distributed" else "collected"} codebook, " +
      s"${if (k > twoLevelK) "two-level" else "exhaustive"} assignment)")
    for (run <- 1 to 2) {
      val sampler = new PeakSampler
      sampler.start()
      val t0 = System.nanoTime()
      val survivors = Similarity.semanticDeduplicate(vectors, k = k,
        threshold = 0.999, maxClusterSize = math.max(10000L, n / 10)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val peak = sampler.stopSampling()
      println(f"[sem] run$run $wall%8.2f s " +
        f"($survivors survivors, driver heap ${usedHeapMb()} MB post-GC, " +
        f"$peak MB peak)")
    }
    spark.stop()
  }
}
