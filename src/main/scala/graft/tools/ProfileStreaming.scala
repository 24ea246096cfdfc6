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

  private def targets(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : Seq[(String, () => Unit)] = Seq(
    "attrib" -> (() => EventsStreaming.clickAttribution(spark, sfDir)
      .write.format("noop").mode("overwrite").save()),
    "dedup" -> (() => EventsStreaming.dedupCounts(spark, sfDir)
      .write.format("noop").mode("overwrite").save()),
    "hourly" -> (() => EventsStreaming.hourlyCounts(spark, sfDir)
      .write.format("noop").mode("overwrite").save()),
    "enriched" -> (() => EventsStreaming.enrichedBySegment(spark, sfDir)
      .write.format("noop").mode("overwrite").save()))

  /** The fixed-cost floor: every micro-batch streaming query pays a
    * per-START overhead (stream initialization, state-store provisioning,
    * checkpoint I/O, the planning of each micro-batch) that is INDEPENDENT
    * of row volume. Contrasting a near-empty input (sf0.001, ~100× fewer
    * events) with the bench's sf0.1 splits each query's wall into
    * floor ≈ t(sf0.001) and marginal ≈ (t(sf0.1) − t(sf0.001)) / Δrows —
    * so a round-over-round read of the streaming bench lines can subtract
    * the floor before calling a delta a regression (the floor is jittery
    * JVM/IO noise, not operator cost). Steady-state (run 2) times.
    */
  private def floorMode(parts: String): Unit = {
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.graft.streamStateParts", parts)
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    val rows = dirs.map(d => d ->
      Engine.table(spark, d, "events").count()).toMap
    val steady = dirs.flatMap { d =>
      targets(spark, d).map { case (name, fn) =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
        }
        println(f"[stream-floor] $name @$d runs ${times.map(t => f"$t%6.3f").mkString(" ")} s")
        (name, d) -> times.last
      }
    }.toMap
    val (small, big) = (dirs.head, dirs.last)
    val dRows = rows(big) - rows(small)
    targets(spark, small).map(_._1).foreach { name =>
      val floor = steady((name, small))
      val marginal = (steady((name, big)) - floor) / dRows
      println(f"[stream-floor] $name floor ≈ $floor%6.3f s, " +
        f"marginal ≈ ${marginal * 1e6}%8.3f µs/row " +
        f"(sf0.1 total ${steady((name, big))}%6.3f s, Δrows=$dRows)")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "floor")
      return floorMode(if (args.length > 1) args(1) else "8")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.graft.streamStateParts", parts)
    targets(spark, sfDir).foreach { case (name, fn) =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn()
        println(f"[stream-profile] parts=$parts $name run$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }
}
