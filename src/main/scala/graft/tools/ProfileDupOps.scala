package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Dedup, TextAnalysis}

/** Scale probe for the round-15 corpus-diagnostic operators —
  * crossSourceOverlap (distinct (source, shingle) shuffle + bounded
  * shingle self-join), shingleDupRatio (same distinct pairs + shared
  * count + join-back), and sampleByWeight (pure row-local filter) — on
  * a factor-blown synthetic corpus: `sbt "runMain
  * graft.tools.ProfileDupOps <sfDir> <factor>"`, two timed runs each at
  * 1x and factor-x. The salt rewrite keeps shingle collisions
  * within-copy only, so the shared-shingle structure scales with the
  * base corpus per copy while total volume scales with factor — the
  * linearity claim is that wall tracks token volume, never pairs².
  */
object ProfileDupOps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profdup"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Engine.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val big = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        concat(col("source"), lit(s"_$k")).as("source"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" c${k}z ").as("text"))
    }.reduce(_ union _)
    val dir = s"$scratchBase/corpus"
    big.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    println(s"[dupops] corpus = ${corpus.count()} docs " +
      s"(${factor}x of ${docs.count()})")
    for ((label, frame) <- Seq("1x" -> docs, s"${factor}x" -> corpus);
         run <- 1 to 2) {
      val t0 = System.nanoTime()
      val nx = Dedup.crossSourceOverlap(frame).count()
      val tx = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nr = Dedup.shingleDupRatio(frame).count()
      val tr = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val ns = TextAnalysis.sampleByWeight(frame,
        length(coalesce(col("text"), lit(""))) / lit(2000.0)).count()
      val ts = (System.nanoTime() - t2) / 1e9
      println(f"[dupops] $label%4s run$run xsource $tx%7.2f s ($nx pairs) " +
        f"dupratio $tr%7.2f s ($nr docs) weighted $ts%6.2f s ($ns kept)")
    }
    spark.stop()
  }
}
