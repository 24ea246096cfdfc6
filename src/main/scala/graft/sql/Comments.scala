package graft.sql

import org.apache.spark.sql.SparkSession

/** Session-scoped COMMENT ON metadata for the temp-table layer (DuckDB
  * host surface; semantics pinned on 1.0: table and column comments,
  * IS NULL clears, commenting a missing table is a Catalog Error).
  * Catalog tables keep Spark's own comment machinery (table properties /
  * ALTER COLUMN COMMENT); this registry serves the temp views Spark's
  * native COMMENT ON rejects. Surfaced through `duckdb_tables()` /
  * `duckdb_columns()`.
  */
object Comments {

  private val tableComments = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()
  private val columnComments = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), String]()

  private def active = SparkSession.active

  def setTable(name: String, comment: Option[String]): Unit = {
    val k = (active, name.toLowerCase)
    comment match {
      case Some(c) => tableComments.put(k, c)
      case None => tableComments.remove(k)
    }
    ()
  }

  def setColumn(table: String, column: String, comment: Option[String]): Unit = {
    val k = (active, table.toLowerCase, column.toLowerCase)
    comment match {
      case Some(c) => columnComments.put(k, c)
      case None => columnComments.remove(k)
    }
    ()
  }

  def tableComment(name: String): Option[String] =
    Option(tableComments.get((active, name.toLowerCase)))

  def columnComment(table: String, column: String): Option[String] =
    Option(columnComments.get((active, table.toLowerCase, column.toLowerCase)))

  /** Drop all comments attached to a table (DROP TABLE hygiene). */
  def dropTable(name: String): Unit = {
    val spark = active
    tableComments.remove((spark, name.toLowerCase))
    import scala.jdk.CollectionConverters._
    columnComments.keySet.asScala
      .filter(k => (k._1 eq spark) && k._2 == name.toLowerCase)
      .foreach(columnComments.remove)
  }
}
