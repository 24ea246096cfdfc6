package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Standing state is three BASE+DELTA parquet tables (hash set, LSH
  * band table, seen text) plus an append-only kept-id log. Each BASE is
  * laid out in `buckets` directory partitions keyed by
  * `pmod(xxhash64(key), buckets)` — band table by (band, bh), hash set
  * by h, seen text by doc_id. The layout choice is deliberate: catalog
  * `bucketBy` would co-locate the probe JOIN (no shuffle of the archive
  * side) but Spark still SCANS every bucket of a bucketed table under a
  * join, so per-batch cost would grow with the archive. Directory
  * partitioning by key hash instead lets each batch compute the
  * (≤ buckets, K-bounded) set of partition values its keys touch and
  * read the base with `bkt IN (...)` — a partition-PRUNED scan, so the
  * archive I/O per batch is O(|batch keys| / buckets × archive), not
  * O(archive). Per-batch UPSERTS do not write into the partitioned
  * layout (one file per touched bucket per batch was measured at ~2×
  * the whole stream floor, and at thousands of buckets it is small-file
  * hell): they append ONE flat file per table to a DELTA dir — the
  * LSM/lakehouse shape — and probes read pruned(base) ∪ delta, the
  * delta bounded by the compaction interval. [[Session.compact]] folds
  * the delta into a fresh one-file-per-bucket base (auto-run every
  * `compactEvery` batches — the knob a production deployment sets to
  * its small-file budget, or disables and runs nightly). At a 100 TB
  * archive with buckets sized like any shuffle (thousands), a small
  * increment touches a small fraction of the base partitions and the
  * per-batch wall tracks the increment, not the archive (measured flat
  * at a 100× archive in SCALE.md; plan-asserted in StreamingSpec: the
  * probe's base scan carries partition filters and reads only touched
  * partitions). Exact verification touches only candidate documents'
  * text via the same pruned probe + semi-join — the
  * [[Dedup.incrementalNear]] economics, lifted to a stream.
  */
object StreamingDedup {

  private val BK = "bkt"

  /** Driver-side pool for a batch's independent Spark actions (the
    * derived checkpoints, the kept write, the three index appends).
    * Bounded small: it carries ACTION SUBMISSION concurrency, not
    * compute — the work itself runs on Spark's scheduler. Daemon
    * threads so a stopped session never hangs the JVM.
    */
  private[streaming] lazy val actionEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        (r: Runnable) => {
          val t = new Thread(r, "graft-sdedup-action")
          t.setDaemon(true)
          t
        }))

  /** Per-query standing state rooted under one temp directory. Each
    * standing table is BASE + DELTA (the LSM/lakehouse shape): the base
    * is hash-partitioned by bucket and serves partition-PRUNED probes;
    * per-batch upserts append ONE flat file to the delta (no partition
    * fan-out, no shuffle — the measured cost of writing one file per
    * touched bucket per batch was ~2× the whole stream floor); probes
    * read pruned(base) ∪ delta, with the delta bounded by the
    * compaction interval. [[Session.compact]] folds the delta into a
    * fresh partitioned base.
    */
  final class Session private[StreamingDedup] (
      spark: SparkSession, root: java.nio.file.Path, threshold: Double,
      numHashes: Int, numBands: Int, shingleN: Int, buckets: Int,
      compactEvery: Int) {

    /** One standing table: a partitioned base (versioned so compaction
      * swaps atomically — probe and compact both run on the
      * foreachBatch thread, never concurrently) plus a flat delta dir.
      */
    private final class Standing(name: String, bkt: Column) {
      private var baseVer = 0
      private var deltaFiles = 0
      // The base is immutable between compactions — reuse one DataFrame
      // per version so its partition discovery (listing `buckets` dirs)
      // runs once, not once per probe per batch. Partition pruning
      // applies per query against the cached file index.
      private var baseDf: DataFrame = null
      private def basePath = root.resolve(s"$name-base-v$baseVer").toString
      private def deltaPath = root.resolve(s"$name-delta").toString
      private def base0: DataFrame = {
        if (baseDf == null) baseDf = spark.read.parquet(basePath)
        baseDf
      }

      def seed(df: DataFrame): Unit = {
        df.withColumn(BK, bkt).repartition(col(BK))
          .write.mode("overwrite").partitionBy(BK).parquet(basePath)
        baseDf = null
      }

      /** Micro-batch upsert: one flat file, O(batch). */
      def append(df: DataFrame): Unit = {
        df.coalesce(1).write.mode("append").parquet(deltaPath)
        deltaFiles += 1
      }

      /** Partition-pruned base scan ∪ the (small) delta. A None bucket
        * set means "assume all touched" — the caller skips the
        * touched-set job when the batch's key count already saturates
        * the bucket range (pruning could not pay for its own collect).
        */
      def probe(touchedBkts: Option[Seq[Int]]): DataFrame = {
        val base = (touchedBkts match {
          case Some(t) if t.isEmpty => base0.filter(lit(false))
          case Some(t) => base0.filter(col(BK).isInCollection(t))
          case None => base0
        }).drop(BK)
        if (deltaFiles == 0) base
        else base.unionByName(spark.read.parquet(deltaPath))
      }

      /** Fold the delta into a fresh one-file-per-bucket base. */
      def compact(): Unit = {
        val old = basePath
        val merged = {
          val b = base0.drop(BK)
          if (deltaFiles == 0) b
          else b.unionByName(spark.read.parquet(deltaPath))
        }
        // Write the new base to the v+1 path BEFORE advancing the
        // version — a failed write must leave the session on the old,
        // intact base (round 18, ADVICE).
        val next = root.resolve(s"$name-base-v${baseVer + 1}").toString
        merged.withColumn(BK, bkt).repartition(col(BK))
          .write.mode("overwrite").partitionBy(BK).parquet(next)
        baseVer += 1
        deltaFiles = 0
        baseDf = null
        Seq(old, deltaPath).foreach { d =>
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p)) {
            val s = java.nio.file.Files.walk(p)
            try s.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
            finally s.close()
          }
        }
      }

      def files: Seq[java.nio.file.Path] = {
        val out = Seq.newBuilder[java.nio.file.Path]
        Seq(basePath, deltaPath).foreach { d =>
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p)) {
            val s = java.nio.file.Files.walk(p)
            try {
              val it = s.iterator()
              while (it.hasNext) {
                val f = it.next()
                if (f.getFileName.toString.endsWith(".parquet")) out += f
              }
            } finally s.close()
          }
        }
        out.result()
      }
    }

    private def bandBkt: Column =
      pmod(xxhash64(col("band"), col("bh")), lit(buckets.toLong)).cast("int")
    private def hashBkt: Column =
      pmod(xxhash64(col("h")), lit(buckets.toLong)).cast("int")
    private def docBkt: Column =
      pmod(xxhash64(col("doc_id")), lit(buckets.toLong)).cast("int")

    private val hashesT = new Standing("hashes", hashBkt)
    private val bandsT = new Standing("bands", bandBkt)
    private val seenT = new Standing("seen", docBkt)
    private val keptDir = root.resolve("kept").toString
    private var batches = 0L

    /** An observed touched-bucket set as the probe's pruning argument:
      * None (scan all, no filter) when every bucket is touched — the
      * filter could prune nothing. The set itself is K-bounded by
      * `buckets` (collect_set over the bucket column), and it rides an
      * action the batch runs ANYWAY (the checkpoint job) as an observed
      * metric — round 18 replaced the r17 per-batch distinct-collect
      * jobs (~1.3 s/batch of pure driver overhead) with this.
      */
    private def pruneArg(bkts: Seq[Int]): Option[Seq[Int]] =
      if (bkts.size >= buckets) None else Some(bkts)

    /** Await one checkpoint job's observed metrics row. */
    private def observed(obs: org.apache.spark.sql.Observation)
        : org.apache.spark.sql.Row =
      scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(600, "s"))

    private[StreamingDedup] def seed(archive: DataFrame): Unit = {
      val a = archive.select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      // Four independent writes, each scanning the source itself (NOT a
      // checkpoint of the archive — at a 100 TB archive that
      // materialization is the thing to avoid), run concurrently: the
      // bootstrap is the lane's single biggest serial span and the
      // writes don't depend on each other.
      val seeds = Seq(
        scala.concurrent.Future(hashesT.seed(Dedup.archiveHashes(a)))(
          StreamingDedup.actionEc),
        scala.concurrent.Future(bandsT.seed(
          Dedup.minhashBands(a, numHashes, numBands, shingleN)))(
          StreamingDedup.actionEc),
        scala.concurrent.Future(seenT.seed(a))(StreamingDedup.actionEc),
        // kept starts empty, schema-stable
        scala.concurrent.Future(a.select(col("doc_id")).limit(0)
          .write.mode("overwrite").parquet(keptDir))(StreamingDedup.actionEc))
      seeds.foreach(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration(3600, "s")))
    }

    /** The foreachBatch body: screen, record kept, upsert the index.
      * Per-batch metrics (row count, touched-bucket sets) ride the
      * checkpoint jobs the batch runs anyway as observed metrics — no
      * separate count()/distinct-collect driver jobs per batch.
      */
    def processBatch(batch0: DataFrame, batchId: Long): Unit = {
      val sp = batch0.sparkSession
      // ONE batch materialization carrying the content hash and BOTH
      // its observed metrics (row count + touched hash buckets) — the
      // separate nh checkpoint was a second serial job per batch.
      val obsB = org.apache.spark.sql.Observation()
      val batch = batch0.select(col("doc_id").cast("long").as("doc_id"),
        col("text"),
        md5(coalesce(col("text"), lit(""))).as("h"))
        .observe(obsB, count(lit(1)).as("n"),
          collect_set(hashBkt).as("bkts"))
        .localCheckpoint(true)
      val bRow = observed(obsB)
      val nBatch = bRow.getLong(0)
      if (nBatch == 0) return
      // AQE is OFF inside micro-batch execution (Spark disables it for
      // streaming plans), so every batch-local shuffle would run at the
      // session's full spark.sql.shuffle.partitions — sized for the big
      // batch lanes, pure task-scheduling overhead at small-increment
      // scale (the r17 bench floor was ~2.9 s per 50-doc batch, mostly
      // 32-task stages over a few thousand rows). Size the batch's
      // shuffles to the increment instead — ~20k docs per partition,
      // floored at 4, capped at the session setting so a
      // production-sized batch keeps the configured width. This is the
      // same move AQE's partition coalescing would make if it ran.
      val prevParts = sp.conf.get("spark.sql.shuffle.partitions")
      sp.conf.set("spark.sql.shuffle.partitions",
        math.max(4L, math.min(prevParts.toLong, nBatch / 20000L + 4L))
          .toString)
      try processBatchSized(batch, bRow.getSeq[Int](1))
      finally sp.conf.set("spark.sql.shuffle.partitions", prevParts)
    }

    private def processBatchSized(batch: DataFrame,
        hashTouched: Seq[Int]): Unit = {
      val sp = batch.sparkSession
      // The batch's actions (derived checkpoints, the kept write,
      // 3 index appends) each decompose into several small jobs
      // (broadcast materializations, file commits) that the foreachBatch
      // thread would otherwise run strictly serially — measured ~37
      // jobs/batch averaging ~50 ms, i.e. the bench-scale floor is job
      // SCHEDULING, not data. Independent actions run concurrently on
      // [[StreamingDedup.actionEc]] instead; Spark's scheduler is
      // thread-safe and at production batch sizes the same overlap
      // hides the small side's I/O behind the big probe job.
      def fork[T](body: => T): scala.concurrent.Future[T] =
        scala.concurrent.Future(body)(StreamingDedup.actionEc)
      def await[T](f: scala.concurrent.Future[T]): T =
        scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration(600, "s"))
      val obsN = org.apache.spark.sql.Observation()
      val nh = batch.select("doc_id", "h")
      val nb = Dedup.minhashBands(batch.select("doc_id", "text"),
        numHashes, numBands, shingleN)
        .observe(obsN, collect_set(bandBkt).as("bkts"))
        .localCheckpoint(true)
      // exact screen: hash seen in the archive (pruned to the batch's hash
      // buckets), or an earlier same-batch id
      val dropExact = nh
        .join(hashesT.probe(pruneArg(hashTouched)).select("h"),
          Seq("h"), "left_semi")
        .select("doc_id")
        .union(nh.select(col("doc_id").as("a"), col("h"))
          .join(nh.select(col("doc_id").as("doc_id"), col("h")), Seq("h"))
          .filter(col("a") < col("doc_id")).select("doc_id"))
        .distinct()
      // near screen: band-bucket candidates vs the SEEN index (pruned to
      // the batch's band buckets) + within batch (a < b drops b), verified
      // exactly on candidate text only
      val seenBands = bandsT.probe(pruneArg(observed(obsN).getSeq[Int](0)))
      val obsC = org.apache.spark.sql.Observation()
      val bBkt = pmod(xxhash64(col("b")), lit(buckets.toLong)).cast("int")
      val crossCands = nb.select(col("doc_id").as("a"), col("band"), col("bh"))
        .join(seenBands.select(col("doc_id").as("b"), col("band"), col("bh")),
          Seq("band", "bh"))
        .select("a", "b").distinct()
        .observe(obsC, collect_set(bBkt).as("bkts"))
        .localCheckpoint(true)
      val selfCands = nb.select(col("doc_id").as("a"), col("band"), col("bh"))
        .join(nb.select(col("doc_id").as("b"), col("band"), col("bh")),
          Seq("band", "bh"))
        .filter(col("a") < col("b")).select("a", "b").distinct()
      val candSeenIds = crossCands.select(col("b").as("doc_id")).distinct()
      val candSeen = seenT.probe(pruneArg(observed(obsC).getSeq[Int](0)))
        .select("doc_id", "text")
        .join(candSeenIds, Seq("doc_id"), "left_semi")
      val sh = Dedup.shinglesJit(batch.select("doc_id", "text"), shingleN)
        .union(Dedup.shinglesJit(candSeen, shingleN))
      // verifyJaccard is symmetric in (a, b); the DROPPED side must be
      // column `a` — the batch doc for cross candidates, the LARGER id
      // for within-batch pairs (greedy: the earlier id was seen first).
      val dropNear = Dedup.verifyJaccard(
          crossCands.union(
            selfCands.select(col("b").as("a"), col("a").as("b"))), sh)
        .filter(col("jaccard") >= threshold)
        .select(col("a").as("doc_id")).distinct()
      // The kept write and the three index appends are independent
      // actions over already-checkpointed inputs — run them
      // concurrently. SAFE against self-matching: every probe above
      // built its base∪delta file index EAGERLY (spark.read.parquet
      // lists files at DataFrame creation), so delta files appended
      // here are invisible to this batch's own scans — the batch never
      // screens against itself.
      val tails = Seq(
        fork(batch.select("doc_id")
          .join(dropExact, Seq("doc_id"), "left_anti")
          .join(dropNear, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(keptDir)),
        // upsert: EVERYTHING seen enters the standing index — one flat
        // delta file per table, O(batch)
        fork(hashesT.append(nh.select("h").distinct())),
        fork(bandsT.append(nb)),
        fork(seenT.append(batch.select("doc_id", "text"))))
      tails.foreach(await(_))
      batches += 1
      if (compactEvery > 0 && batches % compactEvery == 0) compact()
    }

    /** Fold each standing table's delta into a fresh one-file-per-bucket
      * partitioned base. Run automatically every `compactEvery` batches;
      * a production deployment calls it from its maintenance window
      * instead — the rewrite is O(archive), the per-batch appends stay
      * O(batch).
      */
    def compact(): Unit = {
      hashesT.compact(); bandsT.compact(); seenT.compact()
    }

    def kept(): DataFrame = spark.read.parquet(keptDir)

    /** Diagnostics for specs/probes: the probe scan processBatch would
      * perform for a batch's touched-bucket set (pruned base ∪ delta),
      * and the parquet file count of the standing band table.
      */
    private[graft] def prunedBandScan(touchedBkts: Seq[Int]): DataFrame =
      bandsT.probe(Some(touchedBkts))
    private[graft] def bandTouched(batch: DataFrame): Seq[Int] =
      Dedup.minhashBands(
          batch.select(col("doc_id").cast("long").as("doc_id"), col("text")),
          numHashes, numBands, shingleN)
        .select(bandBkt.as(BK)).distinct().collect().map(_.getInt(0)).toSeq
    private[graft] def bandFiles: Seq[java.nio.file.Path] = bandsT.files
  }

  /** Seed a session's standing state from the archive. `buckets` sizes
    * the standing tables' partition fan-out — size it like any shuffle
    * (archive index size / healthy partition size); the default suits
    * test scale. `compactEvery` > 0 auto-compacts the standing tables
    * every that many batches.
    */
  def open(spark: SparkSession, archive: DataFrame, threshold: Double = 0.8,
      numHashes: Int = 128, numBands: Int = 32, shingleN: Int = 3,
      buckets: Int = 64, compactEvery: Int = 16): Session = {
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup")
    root.toFile.deleteOnExit()
    val s = new Session(spark, root, threshold, numHashes, numBands,
      shingleN, buckets, compactEvery)
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
      threshold: Double = 0.8): DataFrame =
    runStaged(spark, stagingDir, schema, open(spark, archive, threshold))

  /** The stream phase alone, against an already-seeded session — lets
    * probes time the O(archive) seed and the per-batch stream cost
    * separately (seeding is the one-time bootstrap a production
    * deployment amortizes; the standing-index claim is about the
    * BATCHES).
    */
  def runStaged(spark: SparkSession, stagingDir: String,
      schema: StructType, sess: Session): DataFrame = {
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
    val staged = (0 until nBatches).map { i =>
      scala.concurrent.Future {
      val (lo, hi) = boundsOf(i)
      val dir = staging.resolve(s"stage$i")
      increment.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.parquet(dir.toString)
      val listing = java.nio.file.Files.list(dir)
      var moved = false
      try {
        val part = listing.iterator()
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
      } finally listing.close()
      require(moved, s"batch $i produced no parquet part file")
      // remove the now-empty stage dir so the source never globs it
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
      }(StreamingDedup.actionEc)
    }
    staged.foreach(f => scala.concurrent.Await.result(f,
      scala.concurrent.duration.Duration(3600, "s")))
    (staging.toString, increment.schema)
  }
}
