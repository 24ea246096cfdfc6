package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** CREATE/DROP SEQUENCE + nextval/currval: advance/currval semantics
  * (gate entry q123_sequence runs the cross-engine script), the
  * DuckDB-pinned error surfaces, and the optimizer-fencing property —
  * repeated nextval calls in one select list must NOT be collapsed by
  * common-subexpression elimination.
  */
class SequenceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    s
  }

  test("nextval advances per evaluation; currval reads the last value") {
    spark.sql("CREATE OR REPLACE SEQUENCE seq_a START 10 INCREMENT 2").collect()
    val r = spark.sql(
      "SELECT nextval('seq_a') a, nextval('seq_a') b, currval('seq_a') c").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 12L, 12L)))
    // state persists across statements
    assert(spark.sql("SELECT nextval('seq_a')").head().getLong(0) == 14L)
  }

  test("nextval over a multi-row relation yields distinct advancing values") {
    spark.sql("CREATE OR REPLACE SEQUENCE seq_b").collect()
    val vals = spark.sql(
      "SELECT nextval('seq_b') v FROM range(5)").collect().map(_.getLong(0))
    assert(vals.toSet == Set(1L, 2L, 3L, 4L, 5L),
      s"5 evaluations must advance 5 times: ${vals.toSeq}")
  }

  test("error surfaces match DuckDB's") {
    val missing = intercept[Exception](
      spark.sql("SELECT nextval('no_such_seq')").collect())
    assert(missing.getMessage.contains("does not exist"), missing.getMessage)
    spark.sql("CREATE OR REPLACE SEQUENCE seq_c").collect()
    val dup = intercept[Exception](spark.sql("CREATE SEQUENCE seq_c"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    assert(spark.sql("CREATE SEQUENCE IF NOT EXISTS seq_c").collect().isEmpty)
    spark.sql("CREATE OR REPLACE SEQUENCE seq_d").collect()
    val cv = intercept[Exception](spark.sql("SELECT currval('seq_d')").collect())
    assert(cv.getMessage.contains("not yet defined in this session"), cv.getMessage)
    spark.sql("DROP SEQUENCE seq_d").collect()
    val dropped = intercept[Exception](spark.sql("DROP SEQUENCE seq_d"))
    assert(dropped.getMessage.contains("does not exist"), dropped.getMessage)
    assert(spark.sql("DROP SEQUENCE IF EXISTS seq_d").collect().isEmpty)
  }

  test("MINVALUE/CYCLE options decline loudly instead of running unbounded") {
    val ex = intercept[Exception](
      spark.sql("CREATE SEQUENCE seq_e MINVALUE 0 MAXVALUE 10 CYCLE"))
    assert(ex.getMessage.contains("unsupported option"), ex.getMessage)
  }
}
