package graft.sql

import scala.util.control.NonFatal

/** DuckDB's `PREPARE name AS <statement>` / `EXECUTE name(args)` /
  * `DEALLOCATE [PREPARE] name` executing — the scripted
  * prepared-statement workflow (host capability; PREPARE runs on the
  * DuckDB 1.0 oracle too, so the lane is literal-oracle-able).
  *
  * Spark parses none of the three, so all ride the hint parser's
  * failure chain. PREPARE stores the statement TEXT as a session-keyed
  * template (replacing silently, as DuckDB does) and returns a 1-row
  * marker like [[MacroRewrite]]'s DDL forms; EXECUTE splices the call's
  * argument expression texts into the template's `$N` / positional `?`
  * markers (quote/comment-aware, each argument parenthesized) and hands
  * the substituted statement back to the parse chain — so a prepared
  * QUALIFY/EXCLUDE/UPDATE statement re-enters the other rewrites and
  * runs. DuckDB binds VALUES where this splices EXPRESSION TEXT: for
  * the constant arguments EXECUTE takes, the two are equivalent; a
  * non-constant argument simply evaluates per row at its splice sites.
  *
  * Registry is session-keyed (a plain ConcurrentHashMap on the
  * SparkSession — entries are small template STRINGS, but the session
  * key itself is strongly retained, so a service that churns through
  * thousands of short-lived sessions with prepared statements should
  * DEALLOCATE or accept the retained keys; DuckDB's registry is
  * connection-scoped the same way). Wrong argument count and unknown
  * names raise clean errors, matching DuckDB's binder.
  */
object PrepareRewrite {

  private val prepareRe =
    """(?is)\A\s*PREPARE\s+([A-Za-z_]\w*)\s+AS\s+(.+?)\s*;?\s*\z""".r
  private val executeRe =
    """(?is)\A\s*EXECUTE\s+([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*;?\s*\z""".r
  private val deallocateRe =
    """(?is)\A\s*DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_]\w*)\s*;?\s*\z""".r

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), String]()

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  def rewrite(sql: String): Option[String] = sql match {
    case prepareRe(name, body) =>
      val spark = org.apache.spark.sql.SparkSession.active
      registry.put((spark, name.toLowerCase), body.trim)
      Some(s"SELECT '${name.toLowerCase}' AS `prepare`")
    case deallocateRe(name) =>
      val spark = org.apache.spark.sql.SparkSession.active
      registry.remove((spark, name.toLowerCase))
      Some(s"SELECT '${name.toLowerCase}' AS `deallocate`")
    case executeRe(name, argText) =>
      val spark = org.apache.spark.sql.SparkSession.active
      val template = registry.get((spark, name.toLowerCase))
      if (template == null)
        fail(s"""Prepared statement "${name.toLowerCase}" does not exist""")
      val args =
        if (argText == null || argText.trim.isEmpty) Vector.empty[String]
        else ReplaceRewrite.splitTop(argText).map(_.trim)
      if (args.exists(_.isEmpty)) fail(s"EXECUTE $name: empty argument")
      Some(substitute(name.toLowerCase, template, args))
    case _ => None
  }

  /** Replace `$N` and positional `?` markers (outside strings, quoted
    * identifiers, and comments) with the parenthesized argument texts.
    */
  private def substitute(name: String, template: String, args: Vector[String]): String = {
    val out = new StringBuilder
    var i = 0
    var positional = 0
    var used = Set.empty[Int]
    val n = template.length
    while (i < n) {
      val c = template.charAt(i)
      c match {
        case '\'' =>
          out.append(c); i += 1
          var done = false
          while (i < n && !done) {
            if (template.charAt(i) == '\'') {
              if (i + 1 < n && template.charAt(i + 1) == '\'') {
                out.append("''"); i += 2
              } else { out.append('\''); i += 1; done = true }
            } else { out.append(template.charAt(i)); i += 1 }
          }
        case '"' | '`' =>
          out.append(c); i += 1
          while (i < n && template.charAt(i) != c) { out.append(template.charAt(i)); i += 1 }
          if (i < n) { out.append(c); i += 1 }
        case '-' if i + 1 < n && template.charAt(i + 1) == '-' =>
          while (i < n && template.charAt(i) != '\n') { out.append(template.charAt(i)); i += 1 }
        case '/' if i + 1 < n && template.charAt(i + 1) == '*' =>
          out.append("/*"); i += 2
          while (i + 1 < n && !(template.charAt(i) == '*' && template.charAt(i + 1) == '/')) {
            out.append(template.charAt(i)); i += 1
          }
          if (i + 1 < n) { out.append("*/"); i += 2 }
        case '$' if i + 1 < n && template.charAt(i + 1).isDigit =>
          var j = i + 1
          while (j < n && template.charAt(j).isDigit) j += 1
          val idx = template.substring(i + 1, j).toInt
          if (idx < 1 || idx > args.length)
            fail(s"EXECUTE $name: statement references $$$idx but " +
              s"${args.length} argument(s) were supplied")
          used += idx
          out.append('(').append(args(idx - 1)).append(')')
          i = j
        case '?' =>
          positional += 1
          if (positional > args.length)
            fail(s"EXECUTE $name: statement has at least $positional " +
              s"positional markers but ${args.length} argument(s) were supplied")
          used += positional
          out.append('(').append(args(positional - 1)).append(')')
          i += 1
        case ch => out.append(ch); i += 1
      }
    }
    if (used.size < args.length)
      fail(s"EXECUTE $name: ${args.length} argument(s) supplied but the " +
        s"statement uses ${used.size}")
    out.toString
  }
}
