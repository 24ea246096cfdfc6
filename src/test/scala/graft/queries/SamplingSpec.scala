package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, SparkTestSession}

/** The host TABLESAMPLE / df.sample surface. These draws are seeded and
  * repeatable WITHIN Spark but engine-specific (each engine owns its
  * sampler), so there is no DuckDB oracle — the cross-engine reproducible
  * sampling story is q43's md5-hash predicate (`sample_stratified` /
  * `q43_deterministic_sample`), which any engine replays identically.
  */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def orders = Engine.table(spark, SparkTestSession.sfDir, "orders")

  test("df.sample with a seed is repeatable and roughly honors the fraction") {
    val total = orders.count()
    val a = orders.sample(withReplacement = false, fraction = 0.2, seed = 42L)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = orders.sample(withReplacement = false, fraction = 0.2, seed = 42L)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must draw the same sample")
    assert(math.abs(a.size.toDouble / total - 0.2) < 0.1,
      s"fraction off: ${a.size} of $total")
    val c = orders.sample(withReplacement = false, fraction = 0.2, seed = 7L)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(c != a, "different seeds should draw different samples")
  }

  test("SQL TABLESAMPLE (PERCENT ... REPEATABLE) and (n ROWS) both parse and run") {
    Engine.registerViews(spark, SparkTestSession.sfDir)
    val total = orders.count()
    val pct = spark.sql(
      "SELECT o_orderkey FROM orders TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .collect().map(_.getLong(0)).toSet
    val pct2 = spark.sql(
      "SELECT o_orderkey FROM orders TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .collect().map(_.getLong(0)).toSet
    assert(pct == pct2 && pct.nonEmpty && pct.size < total)
    val rows = spark.sql("SELECT * FROM orders TABLESAMPLE (25 ROWS)").count()
    assert(rows == 25L)
  }

  test("stratified sampleBy draws per-stratum fractions with a seed") {
    val byPriority = orders.stat.sampleBy("o_orderpriority",
      Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.1), seed = 11L)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Only the named strata are drawn, at roughly their fractions.
    assert(byPriority.keySet.subsetOf(Set("1-URGENT", "2-HIGH")))
    assert(math.abs(byPriority("1-URGENT").toDouble / totals("1-URGENT") - 0.5) < 0.2)
  }
}
