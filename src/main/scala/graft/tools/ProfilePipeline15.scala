package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Bpe, TextAnalysis}

/** Scale probe for the round-15 late-tranche operators —
  * perplexityScores (vocab-bounded bigram LM: corpus passes + broadcast
  * model tables), blocklistFilter (broadcast wordlist, hit-subset
  * combine), Bpe.encode (distinct-word-table encode + corpus join-back),
  * and the composed funnel stages — on a factor-blown corpus:
  * `sbt "runMain graft.tools.ProfilePipeline15 <sfDir> <factor>"`,
  * two timed runs each at 1x and factor-x (run 2 is the warmed number).
  * Salted copies keep vocab growth Heaps-like (fresh `c{k}z` tokens per
  * copy) — the shape that separates corpus-sized passes from
  * vocab-sized model state.
  */
object ProfilePipeline15 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profp15"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val docs = Engine.table(spark, sfDir, "documents")
      .select("doc_id", "source", "lang", "text", "n_chars")
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val bigDocs = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        concat(col("source"), lit(s"_$k")).as("source"), col("lang"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" c${k}z ").as("text"),
        col("n_chars"))
    }.reduce(_ union _)
    val dDir = s"$scratchBase/docs"
    bigDocs.write.mode("overwrite").parquet(dDir)
    val corpus = spark.read.parquet(dDir)
    val blocklist = Seq("slow", "dup", "big")
    val merges = Seq(("s", "c"), ("a", "n"), ("sc", "an"))

    println(s"[p15] corpus = ${corpus.count()} docs (${factor}x)")
    for ((label, d) <- Seq(("1x", docs), (s"${factor}x", corpus)); run <- 1 to 2) {
      val t0 = System.nanoTime()
      val np = TextAnalysis.perplexityScores(d).count()
      val tp = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nb = TextAnalysis.blocklistFilter(d, blocklist)
        .agg(sum("n_hits")).head().getLong(0)
      val tb = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val ne = d.select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .join(Bpe.encode(d, merges).select("word", "n_sub"), Seq("word"))
        .groupBy("source").agg(sum("n_sub")).count()
      val te = (System.nanoTime() - t2) / 1e9
      println(f"[p15] $label%4s run$run perplexity $tp%6.2f s ($np) " +
        f"blocklist $tb%6.2f s ($nb hits) bpe-encode $te%6.2f s ($ne sources)")
    }
    spark.stop()
  }
}
