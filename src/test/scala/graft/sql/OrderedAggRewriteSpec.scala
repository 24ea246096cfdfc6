package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** DuckDB's in-argument ordered aggregates (`agg(args ORDER BY keys)`)
  * through the full SQL entry point. Expected values pinned against
  * DuckDB 1.0 (same VALUES table, same statements).
  */
class OrderedAggRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def reg(): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW oa AS
         SELECT * FROM VALUES
           (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', CAST(NULL AS INT))
         AS v(id, g, x)""")
  }

  test("string_agg with in-argument ORDER BY DESC") {
    reg()
    val rows = spark.sql(
      """SELECT g, string_agg(CAST(id AS STRING), ',' ORDER BY id DESC) s
         FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("a", "2,1"), ("b", "4,3")))
  }

  test("group_concat spelling + trailing FILTER ride along") {
    reg()
    val rows = spark.sql(
      """SELECT g, group_concat(CAST(id AS STRING), ',' ORDER BY id DESC)
                     FILTER (WHERE id > 1) s
         FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("a", "2"), ("b", "4,3")))
  }

  test("array_agg ASC: NULLS LAST default matches DuckDB; null values kept") {
    reg()
    // Order key x has a NULL in group b: DuckDB sorts it last (30 then
    // NULL -> ids 3,4). Value NULLs survive (list semantics): ordering
    // by id in group b yields [30, NULL].
    val byKey = spark.sql(
      """SELECT g, array_agg(id ORDER BY x) a FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList))
    assert(byKey.toSeq == Seq(("a", List(1, 2)), ("b", List(3, 4))))
    val nullVal = spark.sql(
      """SELECT g, array_agg(x ORDER BY id) a FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList))
    assert(nullVal.toSeq == Seq(("a", List(10, 20)), ("b", List(30, null))))
  }

  test("list DESC single key via the comparator; NULLS FIRST honored") {
    reg()
    val desc = spark.sql(
      """SELECT g, list(id ORDER BY x DESC) a FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList))
    // DuckDB: x DESC NULLS LAST -> b: 30 first, NULL last -> ids 3,4.
    assert(desc.toSeq == Seq(("a", List(2, 1)), ("b", List(3, 4))))
    val nf = spark.sql(
      """SELECT g, list(id ORDER BY x DESC NULLS FIRST) a
         FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList))
    assert(nf.toSeq == Seq(("a", List(2, 1)), ("b", List(4, 3))))
  }

  test("multi-key ASC list and nesting inside another call") {
    reg()
    // Multi-key with DESC declines: the statement lands on the hint
    // (parse-time, so the sql() call itself throws).
    assert(intercept[Exception](spark.sql(
      """SELECT array_to_string(
           array_agg(CAST(id AS STRING) ORDER BY g, x DESC NULLS LAST), '|') a
         FROM oa""")).getMessage != null)
    val ok = spark.sql(
      """SELECT array_to_string(
           array_agg(CAST(id AS STRING) ORDER BY g, id), '|') a
         FROM oa""")
      .collect().map(_.getString(0))
    assert(ok.toSeq == Seq("1|2|3|4"))
  }

  test("DISTINCT string_agg keeps DISTINCT through WITHIN GROUP") {
    reg()
    val rows = spark.sql(
      """SELECT g, string_agg(DISTINCT CAST(id % 2 AS STRING), ','
                              ORDER BY CAST(id % 2 AS STRING)) s
         FROM oa GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("a", "0,1"), ("b", "0,1")))
  }
}
