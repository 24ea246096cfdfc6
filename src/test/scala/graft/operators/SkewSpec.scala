package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, SparkTestSession}

/** Salted operators must agree exactly with their unsalted equivalents —
  * salting changes the shuffle shape, never the result.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def events = Engine.events(spark, SparkTestSession.sfDir)

  test("salted aggregation equals plain aggregation on a skewed key") {
    val plain = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(
        events.withColumn("value", round(col("value") * 100, 0).cast("long")),
        "event_type", "value", salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(plain.size == 5)
  }

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5))
      .toDF("event_type", "type_id")
    val plain = events.join(dim, Seq("event_type"))
      .groupBy("type_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(events, dim, "event_type", salt = 8)
      .groupBy("type_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without an exchange on the bucketed key") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Engine.table(spark, SparkTestSession.sfDir, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Engine.table(spark, SparkTestSession.sfDir, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // Co-located bucketed join: no shuffle exchange on either side.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() ==
      Engine.table(spark, SparkTestSession.sfDir, "lineitem").count())
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")
  }
}
