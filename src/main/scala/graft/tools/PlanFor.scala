package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode
import graft.{Engine, SparkEntry}

/** Per-query formatted-plan capture for the optimization rounds:
  * `sbt "runMain graft.tools.PlanFor <sfDir> <outDir> <suffix> <query...>"`
  * writes `<outDir>/<query>_<suffix>.txt` with the
  * `.explain("formatted")` output of each named declared query, so a
  * before/after plan diff (plans/r20/<query>_before.txt vs _after.txt)
  * is reviewable without running Spark.
  *
  * Caveat shared with PlanDump: lanes that iterate eagerly at analysis
  * time (fixpoint TVFs, multi-statement scripts, streaming) run their
  * jobs during capture; their dumped plan is the FINAL composed plan
  * (e.g. the flat union of fixpoint round tables), which is exactly the
  * part a reviewer can check for exchange/scan shape.
  */
object PlanFor {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFor <sfDir> <outDir> <suffix> <query...>")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Engine.session()
    Files.createDirectories(Paths.get(outDir))
    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[planfor] wrote $outDir/${name}_$suffix.txt")
    } finally spark.stop()
  }
}
