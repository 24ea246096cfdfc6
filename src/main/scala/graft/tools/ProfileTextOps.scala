package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.TextAnalysis

/** Scale probe for the round-15 text operators — gopherRules (row-local
  * flag pass) and corpusDivergence (one corpus aggregation + vocab-sized
  * tail) — on a factor-blown synthetic corpus: `sbt "runMain
  * graft.tools.ProfileTextOps <sfDir> <factor>"`, two timed runs each at
  * 1x and at factor-x; linear operators should scale ~factor between
  * the pairs.
  */
object ProfileTextOps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_proftext"
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
    println(s"[textops] corpus = ${corpus.count()} docs " +
      s"(${factor}x of ${docs.count()})")
    for ((label, frame) <- Seq("1x" -> docs, s"${factor}x" -> corpus);
         run <- 1 to 2) {
      val t0 = System.nanoTime()
      val ng = TextAnalysis.gopherRules(frame)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).head().getLong(0)
      val tg = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nd = TextAnalysis.corpusDivergence(frame).count()
      val td = (System.nanoTime() - t1) / 1e9
      println(f"[textops] $label%4s run$run gopher $tg%7.2f s (keep=$ng) " +
        f"divergence $td%7.2f s ($nd groups)")
    }
    spark.stop()
  }
}
