package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Testdata drift tripwire + registerViews isolation.
  *
  * The driver regenerates /root/testdata between rounds; a silent schema
  * change there (events.ts went TIMESTAMP_NANOS → TIMESTAMP_MICROS once)
  * must fail HERE with a named, actionable error — not as a pile of
  * unrelated downstream query crashes.
  */
class TestdataSchemaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  /** Expected (name, type) fingerprint of each table AS THE ENGINE
    * SURFACES IT (Engine.table — i.e. after events ts normalization).
    * timestamp[us] parquet without UTC adjustment reads as TIMESTAMP_NTZ;
    * events.ts is normalized to session-zone TIMESTAMP by Engine.events.
    */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("testdata schemas match the engine's expectations (drift tripwire)") {
    Engine.tableNames.foreach { t =>
      val actual = Engine.table(spark, sfDir, t).schema.fields
        .map(f => f.name -> f.dataType).toSeq
      assert(actual == expected(t),
        s"TESTDATA DRIFT: table '$t' schema changed.\n  stored now: $actual\n" +
          s"  engine expects: ${expected(t)}\n" +
          "Update Engine (and this fingerprint) for the new storage type — " +
          "for events.ts, extend Engine.normalizeEventsTs.")
    }
  }

  test("events.ts stored type is one the adaptive read handles") {
    val stored = Engine.eventsStoredSchema(spark, sfDir)("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(stored),
      s"TESTDATA DRIFT: events.ts stored as $stored — extend " +
        "Engine.normalizeEventsTs for this type")
    // Whatever is stored, the surfaced type is session-zone TIMESTAMP.
    assert(Engine.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }

  test("events.ts VALUES land in a sane epoch range after normalization") {
    // The type fingerprint alone cannot catch a UNIT drift: a generator
    // storing ts as plain INT64 micros (not TIMESTAMP(NANOS)) would probe
    // as LongType — indistinguishable from nanos-as-long — and the
    // DIV-1000 nanos path would silently shrink every value 1000×,
    // collapsing the data into 1970. Pin the VALUE range: testdata events
    // are generated in 2024+; anything pre-2000 means the unit assumption
    // broke, not the data.
    import org.apache.spark.sql.functions.{max, min, year}
    val r = Engine.events(spark, sfDir)
      .agg(min(year(org.apache.spark.sql.functions.col("ts"))).as("lo"),
        max(year(org.apache.spark.sql.functions.col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    assert(lo >= 2000 && hi <= 2100,
      s"TESTDATA DRIFT: normalized events.ts spans years $lo..$hi — the " +
        "stored unit no longer matches Engine.normalizeEventsTs's assumption " +
        "(LongType = nanos). Probe the file and fix the conversion.")
  }

  test("a corrupted events file does not dark unrelated views or queries") {
    val dir = graft.operators.Scratch.freshDir(spark, "drift_sfdir")
    val fs = new java.io.File(dir)
    fs.mkdirs()
    // Real copies of two small tables the probe query needs + a garbage
    // events.parquet (not parquet at all — the read throws at footer).
    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$sfDir/$t.parquet").write
        .mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val bad = new java.io.FileOutputStream(s"$dir/events.parquet")
    try bad.write("this is not a parquet file".getBytes) finally bad.close()

    try {
      // Must not throw, despite 8 of 10 tables being unreadable/absent.
      Engine.registerViews(spark, dir)
      assert(spark.catalog.tableExists("nation"))
      assert(!spark.catalog.tableExists("events"),
        "broken events view should be dropped, not left stale")
      // The q07 shape (ROLLUP over nation/region) — no events involved.
      val rolled = spark.sql(
        """SELECT n.n_regionkey, count(*) AS n FROM nation n
          |GROUP BY ROLLUP(n.n_regionkey)""".stripMargin).collect()
      assert(rolled.nonEmpty)
    } finally {
      // Restore the real views for any suite that runs after this one.
      Engine.registerViews(spark, sfDir)
      assert(spark.catalog.tableExists("events"))
    }
  }
}
