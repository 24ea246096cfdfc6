package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, SparkTestSession}

/** Storage-layer behaviors a 100 TB lake deployment leans on: bounded
  * output file sizes, column codecs, and schema evolution on read.
  */
class StorageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def tmp() = Scratch.freshDir(spark, "storage")

  test("maxRecordsPerFile bounds output file sizes for downstream parallelism") {
    val dir = tmp()
    Engine.table(spark, SparkTestSession.sfDir, "orders")
      .coalesce(1) // one task would otherwise mean one giant file
      .write.option("maxRecordsPerFile", 500).parquet(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2, "expected the writer to roll files at 500 records")
    val back = spark.read.parquet(dir)
    assert(back.count() ==
      Engine.table(spark, SparkTestSession.sfDir, "orders").count())
  }

  test("zstd parquet round-trips and compresses better than uncompressed") {
    val zdir = tmp()
    val udir = tmp()
    val docs = Engine.table(spark, SparkTestSession.sfDir, "documents")
    docs.coalesce(1).write.option("compression", "zstd").parquet(zdir)
    docs.coalesce(1).write.option("compression", "none").parquet(udir)
    def bytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(bytes(zdir) < bytes(udir), "zstd should beat uncompressed")
    assert(spark.read.parquet(zdir).orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("mergeSchema reads evolving parquet layouts as the superset schema") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 42L)).toDF("id", "v1", "v2").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "p", "v1", "v2"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(rows(0) == ((1L, "a", None)))   // old files surface null for v2
    assert(rows(1) == ((2L, "b", Some(42L))))
  }
}
