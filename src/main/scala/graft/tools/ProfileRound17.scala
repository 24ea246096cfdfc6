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
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof17"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
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
        regexp_replace(col("text"), "\\s+", s" s${k}z ").as("text"))
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
}
