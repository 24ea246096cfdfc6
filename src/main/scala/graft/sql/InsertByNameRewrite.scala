package graft.sql

/** Mechanical rewrite of DuckDB's `INSERT INTO tbl BY NAME <query>`
  * (friendly SQL, DuckDB ≥0.10 — the standard guard against
  * column-order drift in ingestion scripts) onto Spark's native
  * column-list INSERT:
  *
  * {{{
  * INSERT INTO tbl BY NAME SELECT 7 AS b, 'x' AS a
  * -- becomes --
  * INSERT INTO tbl (b, a) SELECT 7 AS b, 'x' AS a
  * }}}
  *
  * The query's OUTPUT column names (resolved by analyzing it against
  * the session catalog at rewrite time — the same resolution the
  * analyzer is about to do anyway) become the INSERT's column list, so
  * each value lands in the table column bearing its name and table
  * columns the query doesn't mention take their DEFAULT/NULL — exactly
  * DuckDB's BY NAME contract. Declines to the hint when the query
  * itself doesn't resolve (the analyzer's own error is clearer than a
  * mangled rewrite) or when a column name appears twice in the query
  * output (the mapping would be ambiguous; DuckDB errors there too).
  */
object InsertByNameRewrite {

  private val headRe =
    """(?is)\A\s*INSERT\s+INTO\s+([A-Za-z_][\w.]*)\s+BY\s+NAME\s+(.+?)\s*;?\s*\z""".r

  def rewrite(sql: String): Option[String] = {
    val m = headRe.findFirstMatchIn(sql).getOrElse(return None)
    val table = m.group(1)
    val query = m.group(2).trim
    if (query.isEmpty) return None
    val cols = try {
      org.apache.spark.sql.SparkSession.active.sql(query).columns.toSeq
    } catch { case scala.util.control.NonFatal(_) => return None }
    if (cols.isEmpty ||
      cols.map(_.toLowerCase).distinct.size != cols.size) return None
    // Quote with backticks: resolved output names may carry any
    // characters (an unaliased expression's generated name).
    val list = cols.map(c => "`" + c.replace("`", "``") + "`").mkString(", ")
    Some(s"INSERT INTO $table ($list) $query")
  }
}
