package graft.sql

/** Mechanical rewrite of DuckDB's `QUALIFY` clause (window-function filter,
  * evaluated after window computation — DuckDB docs, the reference host's
  * QoL surface) into the ANSI subquery form Spark parses:
  *
  * {{{
  * SELECT a, b FROM t QUALIFY row_number() OVER (...) <= k ORDER BY a
  * -- becomes --
  * SELECT * EXCEPT (__graft_qualify) FROM (
  *   SELECT a, b, (row_number() OVER (...) <= k) AS __graft_qualify FROM t
  * ) __graft_q WHERE __graft_qualify ORDER BY a
  * }}}
  *
  * The predicate is spliced INTO the original select list (not an outer
  * projection), so it sees the same name scope QUALIFY does — any column of
  * the FROM relations, grouped/aggregated expressions, and (via Spark's
  * lateral column aliases) select-list aliases. Window evaluation order is
  * preserved: the predicate's windows compute alongside the query's own,
  * after grouping, before the filter. Trailing ORDER BY / LIMIT move
  * outside the wrap so they order the FILTERED rows, matching DuckDB.
  *
  * Purely textual and deliberately conservative — a single query block
  * only. Returns None (caller falls back to the landing-pad hint) for
  * shapes where the splice would change meaning: top-level set operations
  * (UNION/INTERSECT/EXCEPT branches own their clauses) and SELECT DISTINCT
  * (DuckDB applies QUALIFY before DISTINCT; splicing the predicate into a
  * distinct list would change the dedup key). The scan is quote- and
  * paren-aware, so QUALIFY inside strings, quoted identifiers, comments,
  * or subqueries (CTE bodies included) never triggers a rewrite.
  */
object QualifyRewrite {

  /** Top-level (depth-0) bare words with their char offsets — skips
    * string literals ('…' with '' escapes), quoted identifiers ("…", `…`),
    * line comments (`-- …`), bracketed comments, and any parenthesized
    * region. A positional parameter marker `?` at ANY depth (outside
    * strings/comments) is surfaced as the pseudo-word `?`: positional
    * binding is by marker ORDER, and the rewrite moves the predicate text
    * ahead of the FROM/WHERE section — values would silently bind to the
    * wrong markers — so the caller declines such statements (named `:p`
    * parameters bind by name and survive reordering fine).
    */
  /** Like [[topLevelWords]] but at ANY paren depth — still skipping
    * strings, quoted identifiers, and comments. For constructs that can
    * appear inside subqueries (POSITIONAL JOIN) where the caller needs
    * "is this really in the SQL, not in a string literal".
    */
  private[sql] def allWords(sql: String): Vector[(String, Int)] =
    scanWords(sql, anyDepth = true)

  private[sql] def topLevelWords(sql: String): Vector[(String, Int)] =
    scanWords(sql, anyDepth = false)

  private def scanWords(sql: String, anyDepth: Boolean): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var i = 0
    var depth = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '?' => out += (("?", i)); i += 1
        case '\'' =>
          i += 1
          var done = false
          while (i < n && !done) {
            if (sql.charAt(i) == '\'') {
              if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
              else { done = true; i += 1 }
            } else i += 1
          }
        case '"' =>
          i += 1; while (i < n && sql.charAt(i) != '"') i += 1; i += 1
        case '`' =>
          i += 1; while (i < n && sql.charAt(i) != '`') i += 1; i += 1
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i = math.min(n, i + 2)
        case c if c.isLetter || c == '_' =>
          val s = i
          while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
          if (anyDepth || depth == 0)
            out += ((sql.substring(s, i).toUpperCase, s))
        case _ => i += 1
      }
    }
    out.result()
  }

  /** The rewritten statement, or None when the shape isn't the supported
    * single query block (caller then surfaces the landing-pad hint).
    */
  def rewrite(sql: String): Option[String] = {
    val words = topLevelWords(sql)
    val qIdx = words.indexWhere(_._1 == "QUALIFY")
    if (qIdx < 0) return None
    // Positional parameters bind by marker order — reordering text around
    // them rebinds values silently. Decline; the hint shows the manual form.
    if (words.exists(_._1 == "?")) return None
    // Bail on shapes the splice would change: set operations (EXCEPT only
    // when used as one — the star-EXCEPT projection `* EXCEPT (col, …)`
    // has '(' next but never '(SELECT'; a parenthesized set-op branch
    // `EXCEPT (SELECT …)` must still count as a set operation) and
    // SELECT DISTINCT.
    val setOp = words.exists { case (w, p) =>
      w == "UNION" || w == "INTERSECT" || (w == "EXCEPT" && {
        val rest = sql.drop(p + "EXCEPT".length).trim
        !rest.startsWith("(") ||
          rest.drop(1).trim.toUpperCase.startsWith("SELECT")
      })
    }
    val selIdx = words.indexWhere(_._1 == "SELECT")
    if (setOp || selIdx < 0) return None
    if (words.lift(selIdx + 1).exists(_._1 == "DISTINCT")) return None
    // Select list ends at the first depth-0 FROM after SELECT; QUALIFY
    // must come after it (i.e. belong to this block).
    val fromPos = words.drop(selIdx + 1).find(_._1 == "FROM").map(_._2)
      .getOrElse(return None)
    val qPos = words(qIdx)._2
    if (fromPos > qPos) return None
    // Predicate runs to the next top-level trailing clause or end of
    // statement. DuckDB also allows a bare OFFSET, and FETCH FIRST … ROWS
    // ONLY, after QUALIFY — fold those out of the predicate text too.
    val trailPos = words.drop(qIdx + 1)
      .find(t => t._1 == "ORDER" || t._1 == "LIMIT" ||
        t._1 == "OFFSET" || t._1 == "FETCH")
      .map(_._2).getOrElse(sql.length)
    val pred = sql.substring(qPos + "QUALIFY".length, trailPos).trim
      .stripSuffix(";").trim
    if (pred.isEmpty) return None
    val trailing = sql.substring(trailPos)
    val inner = sql.substring(0, fromPos) +
      s", ($pred) AS __graft_qualify " +
      sql.substring(fromPos, qPos)
    Some(s"SELECT * EXCEPT (__graft_qualify) FROM ( $inner ) __graft_q " +
      s"WHERE __graft_qualify $trailing")
  }
}
