package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Multimodal, Similarity, TextAnalysis}

/** Scale probe for the late round-15 tranche — skipgramPairs (factor×
  * corpus, Heaps-like vocab growth), imageNearDupPairs (factor× BMPs),
  * knnGraph (factor× vectors, fixed codebook), kCenterSelect and
  * mmrSelect (factor× corpus, fixed k — the k-bounded driver-loop
  * shape): `sbt "runMain graft.tools.ProfileRound15b <sfDir> <factor>"`,
  * two timed runs each at 1x and factor-x (run 2 warmed).
  */
object ProfileRound15b {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_prof15b"
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
    val bigDocs = mat((0 until factor).map { k =>
      if (k == 0) docs
      else docs.select((col("doc_id") + lit(k * off)).as("doc_id"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" s${k}z ").as("text"))
    }.reduce(_ union _), "docs")

    val emb = Engine.table(spark, sfDir, "embeddings")
    val bigEmb = mat((0 until factor).map { k =>
      emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _), "emb")
    // codebook scales with the corpus (constant per-cell occupancy):
    // a FIXED codebook makes IVF quadratic — cells hold factor× more
    // and the query side grows factor×, so candidates grow factor².
    val centroids = emb.filter(col("vec_id") < 16)
    val bigCentroids = bigEmb.filter(col("vec_id") % 10000000L < 16)
    val qv = emb.filter(col("vec_id") === 0)

    println(s"[r15b] docs ${bigDocs.count()}, emb ${bigEmb.count()} (${factor}x)")
    for (run <- 1 to 2;
         (label, d, e) <- Seq(("1x", docs, emb), (s"${factor}x", bigDocs, bigEmb))) {
      val t0 = System.nanoTime()
      val ns = TextAnalysis.skipgramPairs(d, topK = 100).count()
      val ts = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val ni = Multimodal.imageNearDupPairs(spark,
        Multimodal.synthesizeBmp(spark, d, 16), maxDist = 6).count()
      val ti = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val cb = if (label == "1x") centroids else bigCentroids
      val nk = Similarity.knnGraph(e, cb, k = 5, nProbe = 4).count()
      val tk = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val nc = Similarity.kCenterSelect(e, k = 4).count()
      val tc = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val nm = Similarity.mmrSelect(e.filter(col("vec_id") =!= 0), qv, k = 4).count()
      val tm = (System.nanoTime() - t4) / 1e9
      println(f"[r15b] $label%4s run$run skipgram $ts%6.2f s ($ns) " +
        f"imagedup $ti%6.2f s ($ni) knn $tk%6.2f s ($nk) " +
        f"kcenter $tc%6.2f s ($nc) mmr $tm%6.2f s ($nm)")
    }
    spark.stop()
  }
}
