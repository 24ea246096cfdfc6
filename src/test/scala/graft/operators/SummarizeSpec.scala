package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Summarize]] — the DuckDB-SUMMARIZE-shaped table profile: exactly one
  * row per column in schema order, exact counts, min/max as strings,
  * numeric-only avg/std, and graceful nulls for non-orderable types.
  */
class SummarizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("row per column, in schema order, with the documented schema") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 4.0), (3L, null: String, 6.0))
      .toDF("id", "s", "x")
    val rows = Summarize.rows(df)
    assert(rows.map(_.getString(0)) == Seq("id", "s", "x"))
    assert(Summarize.schema.fieldNames.toSeq == Seq(
      "column_name", "column_type", "min_val", "max_val", "approx_unique",
      "avg_val", "std_val", "n_nonnull", "n_null"))
  }

  test("exact stats: counts, min/max strings, numeric avg/std") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 4.0), (3L, null: String, 6.0))
      .toDF("id", "s", "x")
    val byName = Summarize.rows(df).map(r => r.getString(0) -> r).toMap
    val id = byName("id")
    assert(id.getString(2) == "1" && id.getString(3) == "3")
    assert(id.getLong(7) == 3L && id.getLong(8) == 0L)
    assert(id.getDouble(5) == 2.0) // avg
    val s = byName("s")
    assert(s.getString(2) == "a" && s.getString(3) == "b")
    assert(s.getLong(7) == 2L && s.getLong(8) == 1L) // null counted
    assert(s.isNullAt(5) && s.isNullAt(6))           // no avg/std for strings
    val x = byName("x")
    assert(x.getDouble(5) == 4.0)
    assert(math.abs(x.getDouble(6) - 2.0) < 1e-12) // stddev_samp of 2,4,6
  }

  test("non-orderable columns (map) keep exact counts, null the ordered stats") {
    import spark.implicits._
    val df = Seq((1L, Map("k" -> 1)), (2L, Map("k" -> 2))).toDF("id", "m")
    val m = Summarize.rows(df).find(_.getString(0) == "m").get
    assert(m.isNullAt(2) && m.isNullAt(3) && m.isNullAt(4))
    assert(m.getLong(7) == 2L && m.getLong(8) == 0L)
  }

  test("empty schema and empty table degenerate cleanly") {
    import spark.implicits._
    assert(Summarize.rows(spark.emptyDataFrame).isEmpty)
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val rows = Summarize.rows(empty)
    assert(rows.map(_.getString(0)) == Seq("id", "s"))
    assert(rows.forall(r => r.getLong(7) == 0L && r.getLong(8) == 0L))
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("duplicate column names (join results) profile fine — positional resolve") {
    import spark.implicits._
    // A self-join carries two columns named 'id'; by-name col("`id`")
    // would throw AMBIGUOUS_REFERENCE. DuckDB's SUMMARIZE handles such
    // tables, so the profile must resolve positionally.
    val l = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val r = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
    val joined = l.join(r, l("id") === r("id")) // columns: id, s, id, x
    val rows = Summarize.rows(joined)
    assert(rows.map(_.getString(0)) == Seq("id", "s", "id", "x"))
    assert(rows.count(_.getString(0) == "id") == 2)
    assert(rows.forall(_.getLong(7) == 2L))
  }

  test("one scan however many columns: every input row is read exactly once") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("summarize_rows_scanned")
    val df = (1 to 100).map(i => (i.toLong, s"s$i", i * 0.5, i % 7))
      .toDF("a", "b", "c", "d")
      .filter(udf((_: Long) => { acc.add(1L); true }).apply(col("a")))
    Summarize.rows(df)
    assert(acc.value == 100L, s"expected 100 rows scanned once, saw ${acc.value}")
  }
}
