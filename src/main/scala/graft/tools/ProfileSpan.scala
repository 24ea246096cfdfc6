package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.TextAnalysis

/** Focused A/B of the span-dedup gram-key forms (string vs 128-bit
  * fingerprint) on the ScaleProbe synthetic corpus: `sbt "runMain
  * graft.tools.ProfileSpan <sfDir> <factor>"`, two timed runs per form.
  */
object ProfileSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 30
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profspan"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val big = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" c${k}z ").as("text"))
    }.reduce(_ union _)
    val dir = s"$scratchBase/corpus"
    big.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    println(s"[span] corpus = ${corpus.count()} docs")
    for (fp <- Seq(false, true); run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = TextAnalysis.spanDupStats(corpus, fingerprint = fp).count()
      println(f"[span] fingerprint=$fp run$run ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n docs)")
    }
    spark.stop()
  }
}
