package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.Engine
import graft.operators.TextAnalysis

/** Join-strategy A/B for the text-frequency operators' vocabulary join
  * (`sbt "runMain graft.tools.ProfileVocab <sfDir>"`): the token-count
  * table joined back onto pair/position counts used to carry a forced
  * `broadcast()` hint, which is right for a Zipf-small vocabulary and
  * fatally wrong for a web-scale one (distinct tokens reach 10⁸-10⁹ on
  * 100 TB of web text — typos, URLs, hashes — and a forced broadcast
  * OOMs the driver). The hint is gone; this tool proves AQE picks each
  * regime correctly at runtime:
  *
  *   A. documents corpus (Zipf vocabulary, thousands of tokens) →
  *      expects BroadcastHashJoin on the vocab side;
  *   B. synthetic unique-token corpus (every token distinct — vocabulary
  *      ≈ token occurrences, the adversarial web-scale shape, pushed past
  *      the 10 MB autoBroadcastJoinThreshold) → expects the shuffled
  *      fallback (SortMergeJoin/ShuffledHashJoin) instead of an OOMing
  *      broadcast.
  *
  * Prints the realized join operators (AQE final plan) and wall-clock
  * for [[TextAnalysis.collocations]] on both corpora.
  */
object ProfileVocab {

  /** Realized join operator names in the (adaptively re-planned) physical
    * plan, innermost first.
    */
  private def joinOps(df: DataFrame): Seq[String] = {
    def strip(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
      // Realized AQE trees wrap materialized stages in QueryStageExec
      // LEAVES — the join operators live inside stage.plan, which
      // `children` does not expose.
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        strip(q.plan) :+ q
      case other => other.children.flatMap(strip) :+ other
    }
    strip(df.queryExecution.executedPlan)
      .map(_.nodeName).filter(_.contains("Join")).distinct
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def run(name: String, docs: DataFrame, minCount: Int): Unit = {
      val t0 = System.nanoTime()
      val out = TextAnalysis.collocations(docs, window = 3, minCount = minCount, topK = 50)
      // collect(), not count(): count() spawns a SEPARATE QueryExecution,
      // which would leave `out`'s own plan un-executed — joinOps would
      // then read the STATIC initial plan, not the AQE-realized one this
      // tool exists to prove. The output is topK rows; collect is free.
      val n = out.collect().length
      println(f"[vocab] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        f"($n rows) joins = ${joinOps(out).mkString(", ")}")
    }

    // A: natural Zipf vocabulary — the vocab side is tiny; AQE must
    // broadcast it (the plan the old forced hint hard-coded).
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    run("zipf(docs)", docs, minCount = 5)

    // B: adversarial vocabulary — 8M tokens, ALL distinct (8 per row),
    // so the token-count table is 8M rows (far past the 10 MB broadcast
    // threshold at runtime). A forced broadcast here would pull every
    // distinct token through the driver; AQE must instead keep the join
    // shuffled.
    val unique = spark.range(1000000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(i => concat(lit(s"t${i}x"), col("id"))): _*).as("text"))
    run("unique(1Mx8)", unique, minCount = 1)

    spark.stop()
  }
}
