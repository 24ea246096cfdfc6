package graft.tools

import graft.Engine

/** Paste-sweep probe: run each statement from a file (statements
  * separated by lines containing only `---`) through the engine's SQL
  * entry point and print PASS/FAIL + first rows. Registers the
  * TESTDATA.md tables as temp views first so table-referencing
  * statements resolve.
  *
  * `sbt "runMain graft.tools.SqlProbe <file> [sfDir]"`
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Engine.session(master = "local[4]", cpus = 4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Engine.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)
    val stmts = text.split("(?m)^---\\s*$").map(_.trim).filter(_.nonEmpty)
    var pass = 0; var fail = 0
    stmts.zipWithIndex.foreach { case (stmt, i) =>
      val head = stmt.linesIterator.next().take(100)
      try {
        val rows = spark.sql(stmt).collect()
        pass += 1
        println(s"PASS [$i] $head")
        rows.take(5).foreach(r => println(s"       $r"))
      } catch {
        case e: Throwable =>
          fail += 1
          val msg = Option(e.getMessage).getOrElse("")
            .linesIterator.take(9).mkString(" | ").take(800)
          println(s"FAIL [$i] $head\n       [${e.getClass.getName}] $msg")
      }
    }
    println(s"== $pass pass / $fail fail / ${stmts.length} total")
    spark.stop()
  }
}
