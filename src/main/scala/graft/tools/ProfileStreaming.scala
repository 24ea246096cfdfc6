package graft.tools

import graft.Engine
import graft.streaming.EventsStreaming

/** Streaming-query profiling: times each streaming declared query at a
  * given shuffle-partition count (streaming queries capture
  * spark.sql.shuffle.partitions at start, and it becomes the state-store
  * partition count for the query's lifetime) — `sbt "runMain
  * graft.tools.ProfileStreaming <sfDir> <parts>"`. Two runs each: the
  * second isolates steady-state from first-touch codegen.
  */
object ProfileStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val targets: Seq[(String, () => Unit)] = Seq(
      "attrib" -> (() => EventsStreaming.clickAttribution(spark, sfDir)
        .write.format("noop").mode("overwrite").save()),
      "dedup" -> (() => EventsStreaming.dedupCounts(spark, sfDir)
        .write.format("noop").mode("overwrite").save()),
      "hourly" -> (() => EventsStreaming.hourlyCounts(spark, sfDir)
        .write.format("noop").mode("overwrite").save()))
    targets.foreach { case (name, fn) =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn()
        println(f"[stream-profile] parts=$parts $name run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }
}
