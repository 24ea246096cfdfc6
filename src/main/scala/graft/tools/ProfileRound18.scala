package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine

/** Round-18 scale probes, one mode per verdict item:
  *
  *  - `ops <sfDir> <factor>` — the two heaviest batch lanes at ×factor
  *    (verdict #1: the round-17 ×100 probe was DISK-bound on the
  *    suffix shuffle's spill). This round's configuration cuts spill
  *    volume instead of data: SuffixSpans now shuffles 128-bit
  *    fingerprint keys by default (28-byte sorted rows vs the joined
  *    token string), and the session compresses shuffle/spill with
  *    zstd — the knobs a 100 TB deploy would set. Same planted
  *    corpus-wide hot shingle as the round-16/17 probes.
  *  - `retime <sfDir> <n>` — isolated re-time of sim_kcenter /
  *    sim_hard_negatives (verdict #6: 2.2× sub-second drift inside the
  *    round-17 sweep; n fresh timed runs each in one quiet session).
  *  - `bucketgrid <sfDir>` — streaming-dedup standing-index bucket
  *    count sweep (verdict stretch #9): seed + 4-batch stream + probe
  *    files-read fraction at production-shaped bucket counts.
  *
  * `sbt "runMain graft.tools.ProfileRound18 <mode> ..."` — or plain
  * java against the packaged jar for long runs (sbt lock stays free).
  */
object ProfileRound18 {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "ops"
    mode match {
      case "ops" => ops(
        if (args.length > 1) args(1) else "/root/testdata/sf0.1",
        if (args.length > 2) args(2).toInt else 100,
        if (args.length > 3) args(3) else "both")
      case "retime" => retime(
        if (args.length > 1) args(1) else "/root/testdata/sf0.1",
        if (args.length > 2) args(2).toInt else 3,
        if (args.length > 3) args.drop(3).toSeq
        else Seq("sim_kcenter", "sim_hard_negatives"))
      case "bucketgrid" => bucketGrid(
        if (args.length > 1) args(1) else "/root/testdata/sf0.1")
      case other => sys.error(s"unknown mode $other")
    }
  }

  private def ops(sfDir: String, factor: Int,
      lane: String = "both"): Unit = {
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof18"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The deploy knobs under test: zstd shuffle + spill compression.
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-stage shuffle-write/spill telemetry — the round-17 "disk-
    // bound" diagnosis lacked it; with it the ×100 blowup attributed
    // in minutes (the CURVE's verify shuffle, not the suffix sort).
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m.shuffleWriteMetrics.bytesWritten > 1e7 || m.diskBytesSpilled > 1e7)
          println(f"[stage ${sc.stageInfo.stageId}%d] " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
            f"recs=${m.shuffleWriteMetrics.recordsWritten}%d " +
            f"spill=${m.diskBytesSpilled / 1e6}%.0fMB")
      }
    })
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
    println(s"[r18 ops] docs ${factor}x=${bigDocs.count()}")
    for (run <- 1 to 2) {
      if (lane == "both" || lane == "spans") {
        val t0 = System.nanoTime()
        val nSpans = graft.operators.SuffixSpans.dupSpans(bigDocs, minLen = 15)
          .count()
        println(f"[r18 ops run$run ${factor}x] suffix_spans(fp128+zstd) " +
          f"n=$nSpans%d ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      if (lane == "both" || lane == "curve") {
        val t1 = System.nanoTime()
        val nCurve = graft.operators.Dedup.jaccardPairs(bigDocs,
            threshold = 0.5,
            maxShingleDf = graft.operators.Dedup.AutoShingleDf)
          .select(floor(col("jaccard") * 10).cast("long").as("decile"))
          .groupBy("decile").agg(count(lit(1))).count()
        println(f"[r18 ops run$run ${factor}x] capped_curve " +
          f"deciles=$nCurve%d ${(System.nanoTime() - t1) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }

  private def retime(sfDir: String, n: Int,
      lanes: Seq[String] = Seq("sim_kcenter", "sim_hard_negatives")): Unit = {
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir",
      s"${System.getProperty("java.io.tmpdir")}/graft_prof18rt")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    for (name <- lanes; run <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[r18 retime $name run$run] $t%.2f s rows=$rows%d")
    }
    spark.stop()
  }

  private def bucketGrid(sfDir: String): Unit = {
    import graft.streaming.StreamingDedup
    val spark = Engine.session()
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof18bg"
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val inc = docs.filter(col("doc_id") < 200)
    val incDir = s"$scratchBase/inc"
    inc.write.mode("overwrite").parquet(incDir)
    val incRead = spark.read.parquet(incDir)
    val known = docs.filter(col("doc_id") >= 200)
    for (buckets <- Seq(64, 256, 1024, 4096)) {
      val t0 = System.nanoTime()
      val sess = StreamingDedup.open(spark, known, threshold = 0.8,
        buckets = buckets, compactEvery = 0)
      val tSeed = (System.nanoTime() - t0) / 1e9
      val touched = sess.bandTouched(incRead.limit(50))
      val files = sess.bandFiles.size
      val (staging, schema) = StreamingDedup.stageBatches(
        incRead, 4, i => (i * 50L, (i + 1) * 50L))
      val t1 = System.nanoTime()
      val kept = StreamingDedup.runStaged(spark, staging, schema, sess).count()
      val tStream = (System.nanoTime() - t1) / 1e9
      println(f"[r18 bucketgrid b=$buckets%d] seed=$tSeed%.1f s " +
        f"stream(4)=$tStream%.1f s kept=$kept%d " +
        f"probe_fraction=${touched.size}%d/$buckets%d band_files=$files%d")
    }
    spark.stop()
  }
}
