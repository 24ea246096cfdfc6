package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Parquet footer introspection TVFs (parquet_metadata / parquet_schema /
  * parquet_file_metadata): DuckDB-shape columns over files our own
  * writer produced (multi-file directories, globs, nested types), plus
  * the row-count invariants the gate queries (q128-q130, oracled
  * against DuckDB's own TVFs at sf0.01) cannot see — empty globs,
  * datasource directories, distributed-read consistency.
  */
class ParquetIntrospectSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("parquet_metadata: one row per (row group, column); stats carry") {
    val rows = spark.sql(
      s"SELECT * FROM parquet_metadata('$sfDir/nation.parquet')").collect()
    // nation: 3 columns, single row group at this SF
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("path_in_schema")).sorted.toSeq ==
      Seq("n_name", "n_nationkey", "n_regionkey"))
    val key = rows.find(_.getAs[String]("path_in_schema") == "n_nationkey").get
    assert(key.getAs[String]("type") == "INT32")
    assert(key.getAs[String]("stats_min_value") == "0")
    assert(key.getAs[String]("stats_max_value") == "24")
    assert(key.getAs[Long]("stats_null_count") == 0L)
    assert(key.getAs[Long]("row_group_num_rows") == 25L)
    val name = rows.find(_.getAs[String]("path_in_schema") == "n_name").get
    assert(name.getAs[String]("type") == "BYTE_ARRAY")
    assert(name.getAs[String]("stats_min_value") == "NATION_0")
  }

  test("parquet_schema walks nested types depth-first, root first") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqintro").toString
    import spark.implicits._
    Seq((1L, Seq(1, 2), "x")).toDF("id", "xs", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val rows = spark.sql(
      s"SELECT name, type, repetition_type, num_children FROM parquet_schema('$dir')").collect()
    // root + id + s + the 3-level list group chain (list wrapper,
    // repeated group, element) = schema, id, xs, list, element, s
    val names = rows.map(_.getString(0)).toSeq
    assert(names.head == "spark_schema")
    assert(names.contains("xs") && names.contains("element"))
    val root = rows.head
    assert(root.isNullAt(1) && root.getLong(3) == 3L)
    val id = rows.find(_.getString(0) == "id").get
    assert(id.getString(1) == "INT64" && id.isNullAt(3))
  }

  test("parquet_file_metadata sums row groups over a multi-file directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqintro2").toString
    spark.range(0, 1000).toDF("v").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val rows = spark.sql(
      s"SELECT file_name, num_rows, num_row_groups FROM parquet_file_metadata('$dir')").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).sum == 1000L)
    assert(rows.forall(_.getLong(2) >= 1L))
    // the glob spelling lists the same files
    val g = spark.sql(
      s"SELECT COUNT(*) FROM parquet_file_metadata('$dir/part-*.parquet')").head().getLong(0)
    assert(g == 3L)
    // and parquet_metadata over the directory covers every file too
    val m = spark.sql(
      s"SELECT COUNT(DISTINCT file_name) FROM parquet_metadata('$dir')").head().getLong(0)
    assert(m == 3L)
  }

  test("empty glob yields an empty relation, not an error") {
    assert(spark.sql(
      "SELECT * FROM parquet_metadata('/tmp/graft_no_such_*.parquet')").count() == 0L)
    assert(spark.sql(
      "SELECT * FROM parquet_schema('/tmp/graft_no_such_*.parquet')").count() == 0L)
  }
}
