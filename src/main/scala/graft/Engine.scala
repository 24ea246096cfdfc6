package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + testdata helpers shared by the mains, tests, and examples.
  *
  * Settings are chosen for the driver's local[32] harness but scale-aware:
  * AQE handles runtime shuffle-partition coalescing and skew-join splitting
  * on a real cluster, and shuffle.partitions here only seeds the local run
  * (a cluster deployment overrides it or lets AQE pick).
  */
object Engine {

  def session(master: String = "local[32]", cpus: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Configure an existing session the same way Verify/Bench do. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** (session, sfDir, table) → analyzed DataFrame. `spark.read.parquet`
    * reads the file footer for schema every call — ~10-40 ms of driver-side
    * fixed cost per table reference that repeat queries (and the bench's
    * per-query double run) would otherwise pay again and again. A
    * DataFrame is an immutable lazy plan, so handing back the same one is
    * semantically identical. Keyed by session (plans are session-bound)
    * and sfDir; LRU-bounded at 64 entries (≈ one session × several sfDirs
    * × 10 tables), so stale sessions age out instead of pinning plans for
    * the JVM's lifetime.
    *
    * Two caveats, same contract as [[operators.Dedup]]'s label memo:
    * the cached plan captures the parquet FILE LISTING at first read — if
    * an sfDir is regenerated in-session, later reads see the stale list
    * (FileNotFound or stale rows) — and cache keys pin their
    * SparkSession for the JVM's lifetime, which a long-lived multi-session
    * service would notice. Both are disarmed by
    * `spark.graft.tableCache=false`, which reads fresh and caches nothing.
    */
  private val tableCache = new LruMap[(SparkSession, String, String), DataFrame](64)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    def fresh() =
      if (name == "events") events(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet")
    if (spark.conf.getOption("spark.graft.tableCache").contains("false")) fresh()
    else tableCache.getOrElseUpdate((spark, sfDir, name), fresh())
  }

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as
    * a long (legacy conf) and truncate to a microsecond TimestampType — the
    * same truncation DuckDB applies when casting its TIMESTAMP_NS to
    * TIMESTAMP, so both engines see identical values.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
  }

  /** Register every testdata table as a temp view for spark.sql queries.
    * Idempotent per (session, sfDir): repeat calls (every SQL-surface query
    * invokes this defensively) skip the 10-table re-registration. Switching
    * sfDir on the same session re-registers, replacing the views.
    */
  private val viewsRegistered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    viewsRegistered.compute(spark, { (_, prev) =>
      if (prev != sfDir)
        tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
      sfDir
    })
}
