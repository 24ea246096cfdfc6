package graft.sql

/** Mechanical rewrite of DuckDB's star-projection `EXCLUDE` (friendly
  * SQL: `SELECT * EXCLUDE (c1, c2) FROM t`) into Spark 4's native
  * `* EXCEPT (c1, c2)`. The two forms are the same feature under
  * different keywords, so the rewrite is a word swap — but only where
  * the word is REALLY that construct: an `EXCLUDE` that (ignoring
  * whitespace and comments) follows `*` and precedes `(` — or, DuckDB's
  * bare single-name form, one non-keyword identifier (`* EXCLUDE id`,
  * parenthesized into `* EXCEPT (id)`) — at ANY paren
  * depth (subqueries included), outside string literals, quoted
  * identifiers, and comments. Anything else — `EXCLUDE` as an
  * identifier, inside a string — is left byte-for-byte intact. Returns
  * None when nothing qualified (caller rethrows the original parse
  * error).
  */
object ExcludeRewrite {

  /** Clause keywords that must not be claimed as the bare excluded
    * name (`SELECT * EXCLUDE FROM t` is not the single-name form).
    */
  private val keywords = Set(
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "QUALIFY",
    "WINDOW", "UNION", "INTERSECT", "EXCEPT", "JOIN", "INNER", "LEFT",
    "RIGHT", "FULL", "CROSS", "NATURAL", "ON", "USING", "AS", "OFFSET")

  def rewrite(sql: String): Option[String] = {
    val n = sql.length
    // (excludeStart, replaceEnd, bareName): parenthesized hits carry
    // bareName = None and replace just the keyword; bare-name hits
    // consume through the identifier and re-emit it parenthesized.
    val spans = Vector.newBuilder[(Int, Int, Option[String])]
    var i = 0
    var lastSig = ' ' // last significant char seen (outside skips)
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          lastSig = '\''
          i += 1
          var done = false
          while (i < n && !done) {
            if (sql.charAt(i) == '\'') {
              if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
              else { done = true; i += 1 }
            } else i += 1
          }
        case '"' =>
          lastSig = '"'; i += 1; while (i < n && sql.charAt(i) != '"') i += 1; i += 1
        case '`' =>
          lastSig = '`'; i += 1; while (i < n && sql.charAt(i) != '`') i += 1; i += 1
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i = math.min(n, i + 2)
        case c if c.isLetter || c == '_' =>
          val s = i
          while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
          val w = sql.substring(s, i)
          if (w.equalsIgnoreCase("EXCLUDE") && lastSig == '*') {
            // Next significant char must open the column list.
            var j = i
            var next = ' '
            var scanning = true
            while (j < n && scanning) {
              val cj = sql.charAt(j)
              if (cj.isWhitespace) j += 1
              else if (cj == '-' && j + 1 < n && sql.charAt(j + 1) == '-') {
                while (j < n && sql.charAt(j) != '\n') j += 1
              } else if (cj == '/' && j + 1 < n && sql.charAt(j + 1) == '*') {
                j += 2
                while (j + 1 < n && !(sql.charAt(j) == '*' && sql.charAt(j + 1) == '/')) j += 1
                j = math.min(n, j + 2)
              } else { next = cj; scanning = false }
            }
            if (next == '(') spans += ((s, i, None))
            else if (next.isLetter || next == '_') {
              var k = j
              while (k < n && (sql.charAt(k).isLetterOrDigit ||
                sql.charAt(k) == '_')) k += 1
              val name = sql.substring(j, k)
              if (!keywords.contains(name.toUpperCase)) {
                spans += ((s, k, Some(name)))
                i = k
              }
            }
          }
          lastSig = sql.charAt(i - 1)
        case c =>
          if (!c.isWhitespace) lastSig = c
          i += 1
      }
    }
    val hits = spans.result()
    if (hits.isEmpty) None
    else {
      val sb = new StringBuilder
      var pos = 0
      hits.foreach { case (s, e, bare) =>
        sb.append(sql.substring(pos, s))
          .append(bare.fold("EXCEPT")(nm => s"EXCEPT ($nm)"))
        pos = e
      }
      sb.append(sql.substring(pos))
      Some(sb.toString)
    }
  }
}
