package graft.tools

import graft.Engine
import graft.streaming.EventsStreaming

/** Streaming-query profiling: times each streaming declared query at a
  * given state-partition count — `sbt "runMain graft.tools.ProfileStreaming
  * <sfDir> <parts|auto>"`. Two runs each: the second isolates steady-state
  * from first-touch codegen.
  *
  * The knob is `spark.graft.streamStateParts` (NOT the session
  * shuffle-partition setting: EventsStreaming.withStateParts overrides
  * that around every streaming start, so setting only
  * spark.sql.shuffle.partitions here would silently measure the default 8
  * at every nominal <parts>). `auto` exercises the estimate-derived
  * sizing path.
  */
object ProfileStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.graft.streamStateParts", parts)
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
