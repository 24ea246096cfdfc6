package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Dedup, SuffixSpans}

/** Scale probe for the round-16 operators — suffix-sort span dedup
  * (factor× corpus: does ONE sort beat the index's two shuffles as data
  * grows), the CAPPED jaccard candidate pass the threshold curve now
  * declares (the salted corpus plants a corpus-wide hot shingle, the
  * exact case the cap exists for), and the streaming incremental dedup's
  * per-batch cost against a factor× archive (the standing-index promise:
  * batch cost tracks the increment, not the archive):
  * `sbt "runMain graft.tools.ProfileRound16 <sfDir> <factor>"`,
  * two timed runs each (run 2 warmed).
  */
object ProfileRound16 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val mode = if (args.length > 2) args(2) else "all" // all|main|contrast
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof16"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def mat(df: org.apache.spark.sql.DataFrame, name: String) = {
      val dir = s"$scratchBase/$name"
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    // Salted factor-x corpus with a PLANTED corpus-wide hot trigram: the
    // " hotZboiler token " splice lands the 'hotZboiler token s<k>z'
    // family plus one shared bigram context in EVERY document — the
    // boilerplate regime the jaccard df cap exists to survive.
    val bigDocs = mat((0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        concat(lit("the quick hotZboiler shared prefix phrase "),
          graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" s${k}z ")).as("text"))
    }.reduce(_ union _), "docs")
    println(s"[r16] docs 1x=${docs.count()} ${factor}x=${bigDocs.count()}")

    if (mode != "contrast")
    for (run <- 1 to 2; (label, d) <- Seq(("1x", docs), (s"${factor}x", bigDocs))) {
      val t0 = System.nanoTime()
      val nSpans = SuffixSpans.dupSpans(d, minLen = 15).count()
      val tSpan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nCurve = Dedup.jaccardPairs(d, threshold = 0.5,
          maxShingleDf = Dedup.AutoShingleDf)
        .select(floor(col("jaccard") * 10).cast("long").as("decile"))
        .groupBy("decile").agg(count(lit(1))).count()
      val tCurve = (System.nanoTime() - t1) / 1e9
      println(f"[r16 run$run $label] suffix_spans n=$nSpans%d $tSpan%.1f s; " +
        f"capped_curve deciles=$nCurve%d $tCurve%.1f s")
    }

    // Capped vs UNCAPPED contrast under the planted hot phrase, at a
    // reduced factor where the uncapped df² blow-up is still runnable
    // (at 20x the hot-shingle self-join alone is ~4.5e9 candidate pairs).
    if (mode != "main") {
    val cFactor = math.min(4, factor)
    val contrastDocs = mat((0 until cFactor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        concat(lit("the quick hotZboiler shared prefix phrase "),
          graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" s${k}z ")).as("text"))
    }.reduce(_ union _), "cdocs")
    for ((capMode, cap) <- Seq(("capped", Dedup.AutoShingleDf),
        ("uncapped", Long.MaxValue))) {
      val t0 = System.nanoTime()
      val n = Dedup.jaccardPairs(contrastDocs, threshold = 0.5,
        maxShingleDf = cap).count()
      println(f"[r16 contrast ${cFactor}x $capMode] pairs=$n%d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    }

    if (mode != "contrast")
    // Streaming dedup: per-batch cost vs archive size. Archive = the
    // factor-x corpus minus the increment slice; increment = 200 docs in
    // 4 batches — the same shape the gate lane runs at 1x.
    for ((label, d) <- Seq(("1x", docs), (s"${factor}x", bigDocs))) {
      val inc = d.filter(col("doc_id") < 200)
      val known = d.filter(col("doc_id") >= 200)
      val t0 = System.nanoTime()
      val (staging, schema) = graft.streaming.StreamingDedup.stageBatches(
        inc, 4, i => (i * 50L, (i + 1) * 50L))
      val kept = graft.streaming.StreamingDedup
        .runFileStream(spark, staging, schema, known, threshold = 0.8).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[r16 stream $label] archive=${known.count()}%d kept=$kept%d $t%.1f s")
    }
    spark.stop()
  }
}
