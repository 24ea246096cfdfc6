package graft.tools

import java.nio.file.{Files, Paths}
import graft.{Engine, SparkEntry}

/** Targeted correctness dump: like graft.Verify but only for the named
  * queries — `sbt "runMain graft.tools.VerifySome <sfDir> <outDir>
  * <query...>"` — so a new or changed query can be oracle-checked at the
  * big SFs (tools/check_oracles.py globs whatever subdirectories exist)
  * without paying for the full 120-query sweep each iteration.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySome <sfDir> <outDir> <query...>")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Engine.session()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
