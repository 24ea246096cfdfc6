package graft.sql

import scala.util.control.NonFatal

/** Mechanical rewrite of DuckDB's `COLUMNS(...)` column-set expression
  * (friendly SQL, DuckDB ≥0.9 — the reference's host pins 1.3 via
  * .github/workflows/MainDistributionPipeline.yml:29) for the form a
  * pasted script most often carries:
  *
  * {{{
  * SELECT COLUMNS('regex') FROM t [WHERE ...]
  * SELECT COLUMNS(*)       FROM t [WHERE ...]
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
  * statement, the select list is EXACTLY the one COLUMNS expression
  * (`SELECT COLUMNS(arg) FROM ...` — no other items, no wrapping
  * aggregate whose per-column output names DuckDB decorates), argument
  * is `*` or a single-quoted regex literal that compiles, table is a
  * single-part catalog-resolvable name, no join/set-op, and ≥1 column
  * matches (DuckDB errors on zero matches; here the statement declines
  * to the hint). Everything else — lambdas `COLUMNS(c -> ...)`,
  * `COLUMNS(* EXCLUDE ...)`, aggregate wrapping `min(COLUMNS(*))`,
  * unpacking inside expressions — declines to the tier-2 hint.
  */
object ColumnsRewrite {

  private val headRe = """(?is)\A(\s*SELECT\s+)COLUMNS\s*\(""".r

  def rewrite(sql: String): Option[String] = {
    if ("""(?i)\bCOLUMNS\s*\(""".r.findAllMatchIn(sql).size != 1) return None
    val m = headRe.findFirstMatchIn(sql).getOrElse(return None)
    val open = m.end - 1
    val close = ReplaceRewrite.closeOf(sql, open)
    if (close < 0) return None
    val arg = sql.substring(open + 1, close - 1).trim

    // No join/set-op: the expansion resolves ONE table's schema.
    val words = QualifyRewrite.topLevelWords(sql)
    if (words.exists(w => Set("JOIN", "CROSS", "NATURAL", "UNION",
      "INTERSECT", "EXCEPT")(w._1))) return None

    // FROM must follow the COLUMNS(...) directly (select list is exactly
    // this expression), table is a plain single-part name, and the
    // FROM..clause span carries no top-level comma (comma join).
    val fromM = """(?is)\A\s*FROM\s+""".r
      .findFirstMatchIn(sql.substring(close)).getOrElse(return None)
    val namePos = close + fromM.end
    val nameM = """\A[A-Za-z_]\w*""".r.findFirstMatchIn(sql.substring(namePos))
      .getOrElse(return None)
    val tname = nameM.group(0)
    if (namePos + nameM.end < sql.length && sql.charAt(namePos + nameM.end) == '.')
      return None // multipart name
    val tail = sql.substring(namePos + nameM.end)
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
    Some(m.group(1) + projected + sql.substring(close))
  }
}
