package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Dedup, Scratch}

/** Stage-level timing of the incremental near-dup pipeline at a given SF,
  * with the same archive/increment split the declared queries use
  * (doc_id < 200 = archive). Identifies where `dedup_incremental_near`'s
  * bench time goes: exact screen, increment signatures, archive signatures
  * (the part the ArchiveIndex removes), and the verify+components tail.
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val d = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val known = d.filter(col("doc_id") < 200)
    val inc = d.filter(col("doc_id") >= 200)
    println(s"archive=${known.count()} increment=${inc.count()}")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    time("exact_screen.count")(Dedup.incrementalExact(inc, known).count())
    time("increment_bands.count")(Dedup.minhashBands(inc, 128, 32, 3).count())
    time("archive_bands.count")(Dedup.minhashBands(known, 128, 32, 3).count())
    time("archive_index.build+count") {
      val ix = Dedup.buildArchiveIndex(known)
      ix.bands.count() + ix.hashes.count()
    }
    time("incrementalNear.total.count")(
      Dedup.incrementalNear(inc, known, threshold = 0.8).count())
    time("incrementalNear.total.2nd")(
      Dedup.incrementalNear(inc, known, threshold = 0.8).count())

    // The production crawl shape (dedup_incremental_near_idx's split): big
    // archive, small increment, STANDING index — the build is timed once,
    // then repeated increments probe the stored tables; the steady-state
    // line is the operator's per-increment contract.
    val bigKnown = d.filter(col("doc_id") >= 200)
    val smallInc = d.filter(col("doc_id") < 200)
    val index = time("production.index.build (4800-doc archive)") {
      val built = Dedup.buildArchiveIndex(bigKnown)
      val ix = graft.operators.Dedup.ArchiveIndex(
        Scratch.materialize(built.bands, "pix_bands")._1,
        Scratch.materialize(built.hashes, "pix_hashes")._1,
        built.numHashes, built.numBands, built.shingleN)
      ix
    }
    time("production.increment.1st")(
      Dedup.incrementalNear(smallInc, bigKnown, index, threshold = 0.8).count())
    time("production.increment.steady")(
      Dedup.incrementalNear(smallInc, bigKnown, index, threshold = 0.8).count())
    spark.stop()
  }
}
