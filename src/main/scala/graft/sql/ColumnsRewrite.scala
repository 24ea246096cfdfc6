package graft.sql

import scala.util.control.NonFatal

/** Mechanical rewrite of DuckDB's `COLUMNS(...)` column-set expression
  * (friendly SQL, DuckDB ≥0.9 — the reference's host pins 1.3 via
  * .github/workflows/MainDistributionPipeline.yml:29) for the forms a
  * pasted script most often carries:
  *
  * {{{
  * SELECT COLUMNS('regex') FROM t [WHERE ...]
  * SELECT COLUMNS(*)       FROM t [WHERE ...]
  * SELECT a, COLUMNS('regex'), b FROM t ...   -- mixed select list
  * }}}
  *
  * Spark has no column-set macro in SQL, but the select list is static
  * text against a catalog-resolvable table — so, exactly like the
  * sibling [[ReplaceRewrite]], the expression is star-expanded textually
  * into the matching columns before the parse:
  * `SELECT COLUMNS('^l_') FROM lineitem` becomes
  * ``SELECT `l_orderkey`, `l_partkey`, ... FROM lineitem``. DuckDB's
  * regex semantics are RE2 PARTIAL match (`COLUMNS('date')` matches
  * `o_orderdate`), mirrored here with `Matcher.find`; column order and
  * names are the table's, so both engines' outputs hash-compare.
  *
  * Deliberately conservative — supported shape: ONE `COLUMNS(` in the
  * statement, appearing as a WHOLE top-level select-list item (not
  * nested inside an expression or aggregate — DuckDB decorates those
  * output names, so a plain expansion would diverge), argument `*` or a
  * single-quoted regex literal that compiles, table a single-part
  * catalog-resolvable name, no join/set-op, and ≥1 column matches
  * (DuckDB errors on zero matches; here the statement declines).
  * Everything else — lambdas `COLUMNS(c -> ...)`, `COLUMNS(* EXCLUDE
  * ...)`, aggregate wrapping `min(COLUMNS(*))` — declines; the caller
  * ([[GraftHintParser]]) surfaces the guidance hint for declined
  * statements that [[isColumnsShaped]] confirms really are the DuckDB
  * construct (vs. e.g. the text appearing inside a string literal).
  */
object ColumnsRewrite {

  /** The single-table select-list context: (selStart, items, fromPos).
    * None when the statement is not a plain one-table SELECT.
    */
  private def selectItems(sql: String): Option[(Int, Vector[String], Int)] = {
    if ("""(?i)\bCOLUMNS\s*\(""".r.findAllMatchIn(sql).size != 1) return None
    val words = QualifyRewrite.topLevelWords(sql)
    if (words.isEmpty || words.head._1 != "SELECT") return None
    if (sql.take(words.head._2).exists(!_.isWhitespace)) return None
    // No join/set-op: the expansion resolves ONE table's schema.
    if (words.exists(w => Set("JOIN", "CROSS", "NATURAL", "UNION",
      "INTERSECT", "EXCEPT")(w._1))) return None
    val fromW = words.find(_._1 == "FROM").getOrElse(return None)
    val selStart = words.head._2 + "SELECT".length
    val selectList = sql.substring(selStart, fromW._2)
    // DISTINCT over an expanded list changes semantics per column set —
    // decline rather than guess.
    if ("""(?is)\A\s*(DISTINCT|ALL)\b""".r.findFirstIn(selectList).isDefined)
      return None
    val items = ReplaceRewrite.splitTop(selectList).map(_.trim)
    if (items.isEmpty || items.exists(_.isEmpty)) return None
    Some((selStart, items, fromW._2))
  }

  /** The context plus which item IS a whole-item COLUMNS call:
    * (selStart, items, idx, fromPos); None when no item qualifies.
    */
  private def columnsItem(sql: String)
      : Option[(Int, Vector[String], Int, Int)] = {
    val (selStart, items, fromPos) = selectItems(sql).getOrElse(return None)
    val colRe = """(?is)\ACOLUMNS\s*\(""".r
    val idx = items.indexWhere(it => colRe.findFirstIn(it).isDefined)
    if (idx < 0) return None
    // The COLUMNS call must BE the item: trailing text (an alias, an
    // operator) means it is embedded in an expression — decline.
    val m = colRe.findFirstMatchIn(items(idx)).get
    val close = ReplaceRewrite.closeOf(items(idx), m.end - 1)
    if (close < 0 || items(idx).substring(close).trim.nonEmpty) return None
    Some((selStart, items, idx, fromPos))
  }

  /** True when the statement plausibly IS the DuckDB COLUMNS construct —
    * a SELECT whose text (string literals stripped) mentions COLUMNS( —
    * whether or not [[rewrite]] can expand it. Deliberately BROADER than
    * the rewrite's shape (joins, multiple occurrences, aggregate
    * wrapping all count): the caller uses this only to decide if a
    * decline deserves the guidance hint instead of a raw downstream
    * UNRESOLVED_ROUTINE, and the caller has already established no user
    * `columns` function exists — so every statement reaching this test
    * would fail analysis anyway; the only question is the error's
    * quality. `SELECT 'COLUMNS(' AS t FROM x` is NOT shaped (the literal
    * is stripped) and passes through untouched.
    */
  def isColumnsShaped(sql: String): Boolean = {
    val stripped = sql.replaceAll("'(?:[^']|'')*'", "''")
    """(?is)\A\s*SELECT\b""".r.findFirstIn(stripped).isDefined &&
      """(?i)\bCOLUMNS\s*\(""".r.findFirstIn(stripped).isDefined
  }

  def rewrite(sql: String): Option[String] = {
    val (selStart, items, idx, fromPos) = columnsItem(sql).getOrElse(return None)
    val item = items(idx)
    val m = """(?is)\ACOLUMNS\s*\(""".r.findFirstMatchIn(item).get
    val close = ReplaceRewrite.closeOf(item, m.end - 1)
    val arg = item.substring(m.end, close - 1).trim

    // FROM's target: a plain single-part name, and the FROM..clause span
    // carries no top-level comma (comma join).
    val afterFrom = fromPos + "FROM".length
    val nameM = """\A\s*([A-Za-z_]\w*)""".r
      .findFirstMatchIn(sql.substring(afterFrom)).getOrElse(return None)
    val tname = nameM.group(1)
    val nameEnd = afterFrom + nameM.end
    if (nameEnd < sql.length && sql.charAt(nameEnd) == '.')
      return None // multipart name
    val tail = sql.substring(nameEnd)
    val clauseM = """(?is)\b(WHERE|GROUP|HAVING|ORDER|LIMIT|QUALIFY|WINDOW)\b""".r
      .findFirstMatchIn(tail)
    val fromSpan = clauseM.map(cm => tail.substring(0, cm.start)).getOrElse(tail)
    if (fromSpan.contains(",")) return None

    // Argument: `*` (all columns) or a single-quoted regex literal.
    val pattern: Option[java.util.regex.Pattern] =
      if (arg == "*") None
      else {
        val litRe = """\A'((?:[^']|'')*)'\z""".r
        val body = arg match {
          case litRe(b) => b.replace("''", "'")
          case _ => return None
        }
        try Some(java.util.regex.Pattern.compile(body))
        catch { case NonFatal(_) => return None }
      }

    val spark = try org.apache.spark.sql.SparkSession.active
      catch { case NonFatal(_) => return None }
    val cols = try spark.table(tname).columns catch { case NonFatal(_) => return None }
    val kept = pattern match {
      case None => cols.toSeq
      case Some(p) => cols.toSeq.filter(c => p.matcher(c).find())
    }
    if (kept.isEmpty) return None // DuckDB errors on zero matches; hint here

    val projected = kept.map(c => s"`$c`").mkString(", ")
    // Rejoin on NEWLINES, not spaces: items were trimmed, and an item
    // ending in a `-- line comment` would otherwise swallow the next
    // item (or the FROM clause) when flattened onto one line.
    val newList = items.updated(idx, projected).mkString(",\n")
    Some(sql.substring(0, selStart) + " " + newList + "\n" + sql.substring(fromPos))
  }
}
