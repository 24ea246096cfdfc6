package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Dedup

/** Stage timing for the dedup_threshold_curve hot path (the uncapped
  * jaccardPairs at threshold 0.5):
  * `sbt "runMain graft.tools.ProfileCurve <sfDir>"`.
  */
object ProfileCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir",
      s"${System.getProperty("java.io.tmpdir")}/graft_profcurve")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")

    def tm(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[curve] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    def sh = Dedup.shinglesJit(docs, 3)
    tm("shingles")(sh.select(count(lit(1))))
    // inline replica of the candidate pass (jaccardCandidates is
    // operators-private): inverted-index self-join + distinct pairs.
    tm("candidates")(sh.select(col("doc_id").as("a"), col("shingle"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .select(count(lit(1))))
    tm("full")(Dedup.jaccardPairs(docs, threshold = 0.5,
      maxShingleDf = Long.MaxValue).select(count(lit(1))))
    tm("full-again")(Dedup.jaccardPairs(docs, threshold = 0.5,
      maxShingleDf = Long.MaxValue).select(count(lit(1))))
    spark.stop()
  }
}
