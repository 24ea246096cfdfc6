package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming incremental near-dup dedup — the crawl-pipeline production
  * shape: increments arrive as micro-batches (files landing in a
  * directory, Kafka topics on a cluster), each batch is screened against
  * a STANDING archive index, and the index is upserted per batch via
  * `foreachBatch` so the next batch sees everything before it.
  *
  * Semantics — "greedy against everything seen", chosen because it has a
  * CLOSED batch-order-free form a SQL oracle can recompute: a document d
  * is kept iff NO earlier document e — the archive, any earlier batch, or
  * a same-batch document with a smaller id — has the same content hash or
  * shingle-Jaccard(d, e) >= threshold. "Earlier" counts DROPPED documents
  * too (the index records what was SEEN, not what was kept): that is what
  * makes the result independent of how the increment is batched (any
  * ascending-id batching gives the same kept set, spec-pinned 1-batch ==
  * 4-batch), where kept-only indexing would make survival depend on batch
  * boundaries. It also matches the crawl-history contract — a page is a
  * duplicate of something previously CRAWLED, not previously shipped.
  *
  * Standing state is four append-only parquet directories (hash set, LSH
  * band table, seen text, kept ids) — at 100 TB these are the persisted
  * bucketed tables a nightly job compacts; per batch the engine appends
  * O(|batch|) rows and never rewrites the archive. Screening cost per
  * batch: the band-bucket join probes the standing band table (bucketed
  * by (band, bh) in production, a co-located join), and exact
  * verification touches only candidate documents' text via semi-join —
  * the [[Dedup.incrementalNear]] economics, lifted to a stream.
  */
object StreamingDedup {

  /** Per-query standing state rooted under one temp directory. */
  final class Session private[StreamingDedup] (
      spark: SparkSession, root: java.nio.file.Path, threshold: Double,
      numHashes: Int, numBands: Int, shingleN: Int) {
    private val hashesDir = root.resolve("hashes").toString
    private val bandsDir = root.resolve("bands").toString
    private val seenDir = root.resolve("seen").toString
    private val keptDir = root.resolve("kept").toString

    private[StreamingDedup] def seed(archive: DataFrame): Unit = {
      val a = archive.select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      Dedup.archiveHashes(a).write.mode("overwrite").parquet(hashesDir)
      Dedup.minhashBands(a, numHashes, numBands, shingleN)
        .write.mode("overwrite").parquet(bandsDir)
      a.write.mode("overwrite").parquet(seenDir)
      // kept starts empty, schema-stable
      a.select(col("doc_id")).limit(0).write.mode("overwrite").parquet(keptDir)
    }

    /** The foreachBatch body: screen, record kept, upsert the index. */
    def processBatch(batch0: DataFrame, batchId: Long): Unit = {
      val sp = batch0.sparkSession
      val batch = batch0.select(col("doc_id").cast("long").as("doc_id"),
        col("text")).localCheckpoint(true)
      if (batch.isEmpty) return
      val nh = batch.select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("h"))
      // exact screen: hash seen in the archive, or an earlier same-batch id
      val dropExact = nh.join(sp.read.parquet(hashesDir), Seq("h"), "left_semi")
        .select("doc_id")
        .union(nh.select(col("doc_id").as("a"), col("h"))
          .join(nh.select(col("doc_id").as("doc_id"), col("h")), Seq("h"))
          .filter(col("a") < col("doc_id")).select("doc_id"))
        .distinct()
      // near screen: band-bucket candidates vs the SEEN index + within
      // batch (a < b drops b), verified exactly on candidate text only
      val nb = Dedup.minhashBands(batch, numHashes, numBands, shingleN)
        .localCheckpoint(true)
      val seenBands = sp.read.parquet(bandsDir)
      val crossCands = nb.select(col("doc_id").as("a"), col("band"), col("bh"))
        .join(seenBands.select(col("doc_id").as("b"), col("band"), col("bh")),
          Seq("band", "bh"))
        .select("a", "b").distinct()
      val selfCands = nb.select(col("doc_id").as("a"), col("band"), col("bh"))
        .join(nb.select(col("doc_id").as("b"), col("band"), col("bh")),
          Seq("band", "bh"))
        .filter(col("a") < col("b")).select("a", "b").distinct()
      val candSeenIds = crossCands.select(col("b").as("doc_id")).distinct()
      val sh = Dedup.shinglesJit(batch, shingleN)
        .union(Dedup.shinglesJit(
          sp.read.parquet(seenDir).join(candSeenIds, Seq("doc_id"), "left_semi"),
          shingleN))
      // verifyJaccard is symmetric in (a, b); the DROPPED side must be
      // column `a` — the batch doc for cross candidates, the LARGER id
      // for within-batch pairs (greedy: the earlier id was seen first).
      val dropNear = Dedup.verifyJaccard(
          crossCands.union(
            selfCands.select(col("b").as("a"), col("a").as("b"))), sh)
        .filter(col("jaccard") >= threshold)
        .select(col("a").as("doc_id")).distinct()
      batch.select("doc_id")
        .join(dropExact, Seq("doc_id"), "left_anti")
        .join(dropNear, Seq("doc_id"), "left_anti")
        .write.mode("append").parquet(keptDir)
      // upsert: EVERYTHING seen enters the standing index
      nh.select("h").distinct().write.mode("append").parquet(hashesDir)
      nb.write.mode("append").parquet(bandsDir)
      batch.write.mode("append").parquet(seenDir)
    }

    def kept(): DataFrame = spark.read.parquet(keptDir)
  }

  /** Seed a session's standing state from the archive. */
  def open(spark: SparkSession, archive: DataFrame, threshold: Double = 0.8,
      numHashes: Int = 128, numBands: Int = 32, shingleN: Int = 3): Session = {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup")
    root.toFile.deleteOnExit()
    val s = new Session(spark, root, threshold, numHashes, numBands, shingleN)
    s.seed(archive)
    s
  }

  /** Bounded end-to-end run over a staged increment directory: each file
    * is one micro-batch (maxFilesPerTrigger=1, ordered by modification
    * time — how crawl increments land in practice), processed with
    * Trigger.AvailableNow through the real streaming engine. Returns the
    * kept doc ids.
    */
  def runFileStream(spark: SparkSession, stagingDir: String,
      schema: StructType, archive: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    val sess = open(spark, archive, threshold)
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagingDir)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => sess.processBatch(b, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sess.kept()
  }

  /** Stage an increment as `nBatches` single-file parquet batches with
    * ascending modification times (ascending doc_id ranges), returning
    * (stagingDir, schema) — the bounded harness that simulates files
    * landing; production skips this and points [[runFileStream]] at the
    * real landing directory.
    */
  def stageBatches(increment: DataFrame, nBatches: Int,
      boundsOf: Int => (Long, Long)): (String, StructType) = {
    val staging = java.nio.file.Files.createTempDirectory("graft_sdedup_in")
    staging.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 3600L * 1000
    (0 until nBatches).foreach { i =>
      val (lo, hi) = boundsOf(i)
      val dir = staging.resolve(s"stage$i")
      increment.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.parquet(dir.toString)
      val part = java.nio.file.Files.list(dir).iterator()
      var moved = false
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          val dst = staging.resolve(f"b$i%03d.parquet")
          java.nio.file.Files.move(p, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L))
          moved = true
        }
      }
      require(moved, s"batch $i produced no parquet part file")
      // remove the now-empty stage dir so the source never globs it
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
    (staging.toString, increment.schema)
  }
}
