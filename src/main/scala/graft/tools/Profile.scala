package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Engine, SparkEntry}

/** Ad-hoc per-query / per-stage profiler: `sbt "runMain graft.tools.Profile
  * <sfDir> <query...>"` times each named SparkEntry query (noop sink, same
  * measurement as Bench) after a warm-up, so optimization work has a fast
  * feedback loop without running the whole bench suite.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Validate names BEFORE the (slow) session spin-up + warm-up job.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\navailable: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
