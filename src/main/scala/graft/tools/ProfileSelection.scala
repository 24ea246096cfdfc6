package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Bpe, Similarity, TextAnalysis}

/** Scale probe for the round-15 data-selection operators — capPerGroup
  * (two-phase bounded-heap top-N), importanceWeights (one corpus pass to
  * counts + broadcast-vocabulary scoring pass), decontaminateByEmbedding
  * (broadcast eval set, row-local max), and Bpe (corpus pass to word
  * freqs, then vocab-sized merge rounds) — on a factor-blown corpus:
  * `sbt "runMain graft.tools.ProfileSelection <sfDir> <factor>"`, two
  * timed runs each at 1x and factor-x. Copies get fresh sources (so the
  * group count scales too) and salted text; embeddings get fresh ids
  * with the eval set FIXED at the base corpus's label-0 rows — the
  * production shape where the benchmark suite stays put while the corpus
  * grows.
  */
object ProfileSelection {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profsel"
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

    val emb = Engine.table(spark, sfDir, "embeddings")
    val eoff = emb.agg(max("vec_id")).head().getLong(0) + 1
    val bigEmb = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + lit(k * eoff)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _)
    val eDir = s"$scratchBase/emb"
    bigEmb.write.mode("overwrite").parquet(eDir)
    val bigE = spark.read.parquet(eDir)
    val evalSet = emb.filter(col("label") === 0)

    println(s"[sel] corpus = ${corpus.count()} docs, ${bigE.count()} vectors " +
      s"(${factor}x)")
    for ((label, d, e) <- Seq(("1x", docs, emb), (s"${factor}x", corpus, bigE));
         run <- 1 to 2) {
      val t0 = System.nanoTime()
      val nc = TextAnalysis.capPerGroup(d, "source", 5, "n_chars").count()
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val ni = TextAnalysis.importanceWeights(d, col("lang") === "en").count()
      val ti = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nd = Similarity.decontaminateByEmbedding(
        e.filter(col("label") =!= 0), evalSet, 0.35).count()
      val td = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val np = Bpe.pairStats(d, 20).count()
      val tp = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val nm = Bpe.train(d, nMerges = 3).count()
      val tm = (System.nanoTime() - t4) / 1e9
      println(f"[sel] $label%4s run$run cap $tc%6.2f s ($nc) " +
        f"importance $ti%6.2f s ($ni) decon $td%6.2f s ($nd) " +
        f"bpe-pairs $tp%6.2f s ($np) bpe-train3 $tm%6.2f s ($nm)")
    }
    spark.stop()
  }
}
