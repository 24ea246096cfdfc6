package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Dedup

/** Stage-level timing of the dedup pipeline at a given SF, optionally on
  * the ScaleProbe synthetic corpus: `sbt "runMain graft.tools.ProfileDedup
  * <sfDir> [factor]"` (factor > 1 synthesizes factor× docs with the
  * salt-rewrite scheme — near-dup structure per copy, zero cross-copy
  * dups — the loop for attributing ScaleProbe's end-to-end wall to
  * signature pass / bucket join / verify / propagation).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 1
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir",
      s"${System.getProperty("java.io.tmpdir")}/graft_profdedup")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    // Offset above the real id range so planted duplicates never collide
    // with existing doc_ids (a fixed +10000 breaks at SFs with more rows).
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val base = docs.union(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + off).as("doc_id"), col("text")))
    val corpus =
      if (factor <= 1) { base.persist(); base }
      else {
        val boff = base.agg(max("doc_id")).head().getLong(0) + 1
        val big = (0 until factor).map { k =>
          if (k == 0) base
          else base.select((col("doc_id") + lit(k * boff)).as("doc_id"),
            graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" c${k}z ").as("text"))
        }.reduce(_ union _)
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_profdedup/corpus"
        big.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }
    println("corpus rows = " + corpus.count())

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    time("bands.count") {
      Dedup.minhashBands(corpus, 128, 32, 3).count()
    }
    time("candidates.count") {
      val banded = Dedup.minhashBands(corpus, 128, 32, 3)
      banded.select(col("doc_id").as("a"), col("band"), col("bh"))
        .join(banded.select(col("doc_id").as("b"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
    }
    time("lsh_pairs.count") {
      Dedup.minhashLsh(corpus, threshold = 0.8).count()
    }
    // threshold 1.0 short-circuits to the exact-hash path; profile BOTH.
    time("deduplicate_exact.count") {
      Dedup.deduplicate(corpus, threshold = 1.0).count()
    }
    time("deduplicate_near.count") {
      Dedup.deduplicate(corpus, threshold = 0.8).count()
    }
    spark.stop()
  }
}
