package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.streaming.StreamingDedup

/** Round-17 scale probe for the BUCKETED streaming-dedup standing index:
  * per-batch stream cost against a 1× vs factor× archive, with the
  * O(archive) seed timed separately (the one-time bootstrap) — the claim
  * under test is that the partition-PRUNED probe keeps the BATCH cost
  * flat as the archive grows, where the round-16 layout re-scanned the
  * full band table every batch.
  * `sbt "runMain graft.tools.ProfileRound17 <sfDir> <factor> [buckets]"`.
  * Also prints the standing band table's file count and the touched
  * bucket count for one probe batch — the pruning ratio a plan reader
  * would check.
  */
object ProfileRound17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 100
    val buckets = if (args.length > 2) args(2).toInt else 64
    val mode = if (args.length > 3) args(3) else "stream" // stream|ops
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof17"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    if (mode == "ops") return opsMode(spark, sfDir, factor, scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    def mat(df: org.apache.spark.sql.DataFrame, name: String) = {
      val dir = s"$scratchBase/$name"
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val bigDocs = mat((0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" s${k}z ").as("text"))
    }.reduce(_ union _), "docs")

    // The SAME increment (200 docs, 4 batches) probes both archives.
    val inc = mat(docs.filter(col("doc_id") < 200), "inc")
    for ((label, d) <- Seq(("1x", docs), (s"${factor}x", bigDocs))) {
      val known = d.filter(col("doc_id") >= 200)
      val nArch = known.count()
      val t0 = System.nanoTime()
      val sess = StreamingDedup.open(spark, known, threshold = 0.8,
        buckets = buckets, compactEvery = 0)
      val tSeed = (System.nanoTime() - t0) / 1e9
      val touched = sess.bandTouched(inc.limit(50))
      val files = sess.bandFiles.size
      val (staging, schema) = StreamingDedup.stageBatches(
        inc, 4, i => (i * 50L, (i + 1) * 50L))
      val t1 = System.nanoTime()
      val kept = StreamingDedup.runStaged(spark, staging, schema, sess).count()
      val tStream = (System.nanoTime() - t1) / 1e9
      println(f"[r17 stream $label] archive=$nArch%d seed=$tSeed%.1f s " +
        f"stream(4 batches)=$tStream%.1f s kept=$kept%d " +
        f"probe_buckets=${touched.size}%d/${buckets}%d band_files=$files%d")
    }
    spark.stop()
  }

  /** 100× probes for the two heaviest batch lanes — suffix-span dedup
    * and the CAPPED threshold-curve candidate pass (round-16 verdict
    * stretch: the 20× probes extrapolate; one 100× run pins the
    * constant). The 100× suffix sort shuffles ~40 GB of suffix keys —
    * the default 32-partition local profile OOMs its shuffle sorters,
    * so this mode raises the shuffle sizing the way a cluster deploy
    * would (partition count tracks data volume; the session scaladoc's
    * contract). Same planted corpus-wide hot shingle as ProfileRound16.
    */
  private def opsMode(spark0: org.apache.spark.sql.SparkSession,
      sfDir: String, factor: Int, scratchBase: String): Unit = {
    spark0.stop()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "512")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val dir = s"$scratchBase/opsdocs"
    (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        concat(lit("the quick hotZboiler shared prefix phrase "),
          graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" s${k}z ")).as("text"))
    }.reduce(_ union _).write.mode("overwrite").parquet(dir)
    val bigDocs = spark.read.parquet(dir)
    println(s"[r17 ops] docs ${factor}x=${bigDocs.count()}")
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val nSpans = graft.operators.SuffixSpans.dupSpans(bigDocs, minLen = 15).count()
      val tSpan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nCurve = graft.operators.Dedup.jaccardPairs(bigDocs, threshold = 0.5,
          maxShingleDf = graft.operators.Dedup.AutoShingleDf)
        .select(floor(col("jaccard") * 10).cast("long").as("decile"))
        .groupBy("decile").agg(count(lit(1))).count()
      val tCurve = (System.nanoTime() - t1) / 1e9
      println(f"[r17 ops run$run ${factor}x] suffix_spans n=$nSpans%d $tSpan%.1f s; " +
        f"capped_curve deciles=$nCurve%d $tCurve%.1f s")
    }
    spark.stop()
  }
}
