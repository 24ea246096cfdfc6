package graft.sql

/** Round-18 sixth-sweep operators — Postgres-style spellings DuckDB
  * hosts that Spark's grammar lacks, all PARSE-FAILURE-ONLY (none of
  * these token sequences is valid Spark SQL, so no native statement
  * can ever be claimed):
  *
  *  - `a ^@ b` (starts-with) → `startswith(a, b)` (NULL propagation
  *    and the ''-prefix-of-anything contract match, pinned).
  *  - `a && b` (list overlap / list_has_any) → `arrays_overlap` over
  *    NULL-compacted operands: DuckDB's `&&` is NULL-BLIND —
  *    `[1,NULL] && [NULL]` is FALSE, not NULL — while whole-NULL
  *    operands stay NULL (compact(NULL) is NULL; pinned).
  *  - `a @> b` / `a <@ b` (contains-all) → `forall` over the compacted
  *    CONTAINED side with a strict per-element `coalesce(array_contains
  *    (container, t), false)`: DuckDB ignores NULL elements of the
  *    contained side (`[1,2] @> [NULL]` is TRUE), treats an unmatched
  *    element as plain FALSE even when the container holds NULLs
  *    (`[1,NULL] @> [2]` is FALSE), and returns NULL only for
  *    whole-NULL operands — hence the explicit IS NULL case.
  *  - `l <op> ANY|SOME|ALL (<list>)` (quantified comparison) →
  *    `exists` / `forall` with the comparison inside the lambda:
  *    Spark's three-valued lambda semantics match DuckDB's exactly
  *    (= any([1,NULL]) → NULL, = any([2,NULL]) → TRUE, any([]) →
  *    FALSE, all([]) → TRUE; all pinned). Scalar-SUBQUERY operands
  *    decline — the host itself rejects them ("use IN").
  *  - `fn(args IGNORE|RESPECT NULLS)` (the in-parens DuckDB spelling)
  *    → `fn(args) IGNORE|RESPECT NULLS` (Spark's suffix position).
  *  - trailing `ORDER BY ... LIMIT <p>%` (percent limit) → a
  *    row_number/count window pair over the sorted body with
  *    `floor(n·p/100)` kept rows (DuckDB's rounding: 10% of 3 rows =
  *    0, 67% = 2; pinned). Requires the explicit ORDER BY (a percent
  *    of an unordered result is arbitrary rows on both engines —
  *    declined to the hint rather than picked silently).
  *
  * Operand extraction reuses the tilde-operator discipline
  * (GraftSparkExtensions.tildeOpRewrite, round 14): one operand on
  * each side — a literal, a word chain (optional call parens), or a
  * parenthesized group — with tighter-binding neighbors (arithmetic,
  * concat, brackets) DECLINING to the hint instead of misgrouping.
  */
object ListOpRewrite {

  private def wordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '$'

  /** End index (exclusive) of the right operand starting at/after
    * `from`: literal | paren group | word chain w/ optional call parens
    * | bracket literal (the duck list form — rewritten later in the
    * chain).
    */
  private def scanRight(cur: String, m: String, from: Int): Option[Int] = {
    val n = m.length
    var r = from
    while (r < n && cur.charAt(r).isWhitespace) r += 1
    if (r >= n) return None
    if (cur.charAt(r) == '\'') {
      r += 1
      var done = false
      while (r < n && !done) {
        if (cur.charAt(r) == '\'') {
          if (r + 1 < n && cur.charAt(r + 1) == '\'') r += 2
          else { r += 1; done = true }
        } else r += 1
      }
      if (!done) None else Some(r)
    } else if (m.charAt(r) == '(') {
      val c = ReplaceRewrite.closeOf(cur, r)
      if (c < 0) None else Some(c)
    } else if (m.charAt(r) == '[') {
      // bracket list literal: balanced [ ] scan on the masked text
      var depth = 0
      var i = r
      while (i < n) {
        m.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) return Some(i + 1)
          case _ =>
        }
        i += 1
      }
      None
    } else if (wordChar(m.charAt(r))) {
      while (r < n && wordChar(m.charAt(r))) r += 1
      var k = r
      while (k < n && cur.charAt(k).isWhitespace) k += 1
      if (k < n && m.charAt(k) == '(') {
        val c = ReplaceRewrite.closeOf(cur, k)
        if (c < 0) None else Some(c)
      } else Some(r)
    } else None
  }

  private val clauseKeywords = Set("select", "where", "and", "or", "on",
    "when", "then", "else", "by", "having", "qualify", "not", "in",
    "as", "from", "join", "case", "limit", "all", "any", "some")

  /** Public bridge for sibling rewrites (EnumTypes' `x::enum` claim
    * reuses the operand discipline).
    */
  private[sql] def scanLeftPub(cur: String, m: String, at: Int): Option[Int] =
    scanLeft(cur, m, at)

  /** Right-operand bridge for EnumTypes' comparison wrap. */
  private[sql] def scanRightPub(cur: String, m: String, from: Int): Option[Int] =
    scanRight(cur, m, from)

  /** Start index of the left operand whose last char sits at `at`
    * (inclusive): mirrors scanRight. Returns the start index.
    */
  private def scanLeft(cur: String, m: String, at: Int): Option[Int] = {
    var l = at
    while (l >= 0 && cur.charAt(l).isWhitespace) l -= 1
    if (l < 0) return None
    if (cur.charAt(l) == '\'' && m.charAt(l) == ' ') {
      // closing quote of a masked literal: forward-scan literal spans
      var i = 0
      var start = -1
      val n = m.length
      while (i <= l) {
        if (cur.charAt(i) == '\'' && m.charAt(i) == ' ') {
          val s = i
          i += 1
          var done = false
          while (i < n && !done) {
            if (cur.charAt(i) == '\'') {
              if (i + 1 < n && cur.charAt(i + 1) == '\'') i += 2
              else done = true
            } else i += 1
          }
          if (i == l) start = s
          i += 1
        } else i += 1
      }
      if (start < 0) None else Some(start)
    } else if (m.charAt(l) == ']') {
      var depth = 0
      var i = l
      while (i >= 0) {
        m.charAt(i) match {
          case ']' => depth += 1
          case '[' => depth -= 1; if (depth == 0) return Some(i)
          case _ =>
        }
        i -= 1
      }
      None
    } else if (m.charAt(l) == ')') {
      var depth = 1
      l -= 1
      while (l >= 0 && depth > 0) {
        m.charAt(l) match {
          case ')' => depth += 1
          case '(' => depth -= 1
          case _ =>
        }
        l -= 1
      }
      if (depth != 0) return None
      // optional function name directly before the open paren — but
      // never a clause keyword
      val beforeParen = l
      while (l >= 0 && cur.charAt(l).isWhitespace) l -= 1
      val nameEnd = l
      while (l >= 0 && wordChar(m.charAt(l))) l -= 1
      if (nameEnd == l ||
        clauseKeywords(cur.substring(l + 1, nameEnd + 1).toLowerCase))
        Some(beforeParen + 1)
      else Some(l + 1)
    } else if (wordChar(m.charAt(l))) {
      while (l >= 0 && wordChar(m.charAt(l))) l -= 1
      Some(l + 1)
    } else None
  }

  /** Tighter-binding neighbor guards (the tilde discipline): decline if
    * the char left of the left operand or right of the right operand
    * binds tighter than a comparison.
    */
  private def neighborsSafe(cur: String, m: String, ls: Int, re: Int)
      : Boolean = {
    var pb = ls - 1
    while (pb >= 0 && cur.charAt(pb).isWhitespace) pb -= 1
    if (pb >= 0 && "|+-*/%^&~!@<".indexOf(m.charAt(pb)) >= 0) return false
    var pa = re
    while (pa < m.length && cur.charAt(pa).isWhitespace) pa += 1
    if (pa < m.length && "+-*/%^&~!@[<|".indexOf(m.charAt(pa)) >= 0)
      return false
    true
  }

  /** `^@`, `&&`, `@>`, `<@` — one per pass, re-entering via the chain's
    * recursion for multiples and for bracket-literal operands.
    */
  def rewriteOps(text: String): Option[String] = {
    val ops = Seq("^@", "&&", "@>", "<@")
    if (!ops.exists(text.contains)) return None
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      val hits = ops.flatMap { op =>
        val i = m.indexOf(op)
        if (i >= 0) Some((i, op)) else None
      }
      if (hits.isEmpty) return if (changed) Some(cur) else None
      val (oi, op) = hits.minBy(_._1)
      val re = scanRight(cur, m, oi + op.length).getOrElse(return None)
      val ls = scanLeft(cur, m, oi - 1).getOrElse(return None)
      if (!neighborsSafe(cur, m, ls, re)) return None
      val a = cur.substring(ls, oi).trim
      val b = cur.substring(oi + op.length, re).trim
      if (a.isEmpty || b.isEmpty) return None
      val repl = op match {
        case "^@" => s"startswith($a, $b)"
        case "&&" => s"arrays_overlap(array_compact($a), array_compact($b))"
        case "@>" =>
          s"(CASE WHEN ($a) IS NULL OR ($b) IS NULL THEN NULL ELSE " +
            s"forall(array_compact($b), __graft_t -> " +
            s"coalesce(array_contains($a, __graft_t), false)) END)"
        case "<@" =>
          s"(CASE WHEN ($a) IS NULL OR ($b) IS NULL THEN NULL ELSE " +
            s"forall(array_compact($a), __graft_t -> " +
            s"coalesce(array_contains($b, __graft_t), false)) END)"
      }
      cur = cur.substring(0, ls) + repl + cur.substring(re)
      changed = true
    }
    if (changed) Some(cur) else None
  }

  /** JSON arrow operators (round-18 seventh sweep): `j -> k` extracts
    * as JSON text (the engine's json_extract / get_json_object — the
    * documented string-quoting divergence applies), `j ->> k` as
    * unquoted text (exact). Keys: string literals (field names, or
    * '$...' paths passed verbatim) and integer literals (0-based array
    * index, DuckDB-pinned: '[5,6]' -> 0 is '5'). Left-associative
    * chains resolve earliest-first, so the rewritten call becomes the
    * next round's left operand. Parse-failure only.
    */
  private val hofNames = Set("transform", "filter", "exists", "forall",
    "aggregate", "reduce", "zip_with", "map_filter", "map_zip_with",
    "transform_keys", "transform_values", "array_sort", "list_transform",
    "list_filter", "list_reduce", "list_where", "list_select",
    "list_grade_up")

  /** Name of the innermost call enclosing `pos`, lowercased ("" when
    * not inside any call or the paren is a bare group).
    */
  private def enclosingCallee(cur: String, m: String, pos: Int): String = {
    var depth = 0
    var i = pos
    var open = -1
    while (i >= 0 && open < 0) {
      m.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth == 0) open = i else depth -= 1
        case _ =>
      }
      i -= 1
    }
    if (open < 0) return ""
    var l = open - 1
    while (l >= 0 && cur.charAt(l).isWhitespace) l -= 1
    val e = l
    while (l >= 0 && wordChar(m.charAt(l))) l -= 1
    if (e == l) "" else cur.substring(l + 1, e + 1).toLowerCase
  }

  def rewriteJsonArrows(text: String): Option[String] = {
    if (!text.contains("->")) return None
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 256) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      var oi = m.indexOf("->")
      var applied = false
      while (oi >= 0 && !applied) {
        val isText = oi + 2 < m.length && m.charAt(oi + 2) == '>'
        val opLen = if (isText) 3 else 2
        def skip(): Unit = { oi = m.indexOf("->", oi + opLen) }
        // `->` is ALSO Spark's lambda arrow; lambdas are only legal as
        // a higher-order function's argument, so an occurrence inside
        // a call to a known HOF name is SKIPPED — splicing a lambda
        // arrow into json_extract would be silent corruption.
        if (hofNames(enclosingCallee(cur, m, oi))) skip()
        else {
          val reOpt = scanRight(cur, m, oi + opLen)
          val lsOpt = scanLeft(cur, m, oi - 1)
          if (reOpt.isEmpty || lsOpt.isEmpty) skip()
          else {
            val re = reOpt.get
            val ls = lsOpt.get
            val l = cur.substring(ls, oi).trim
            val kRaw = cur.substring(oi + opLen, re).trim
            // Same-precedence left-assoc chains: a FOLLOWING arrow is
            // fine (this splice becomes its left operand next round);
            // other tight-binding neighbors skip the occurrence.
            var pb = ls - 1
            while (pb >= 0 && cur.charAt(pb).isWhitespace) pb -= 1
            var pa = re
            while (pa < m.length && cur.charAt(pa).isWhitespace) pa += 1
            val nextIsArrow = pa + 1 < m.length && m.charAt(pa) == '-' &&
              m.charAt(pa + 1) == '>'
            val badLeft =
              pb >= 0 && "|+-*/%^&~!@<".indexOf(m.charAt(pb)) >= 0
            val badRight = !nextIsArrow && pa < m.length &&
              "+-*/%^&~!@[<|".indexOf(m.charAt(pa)) >= 0
            val path =
              if (kRaw.matches("\\d+")) Some(s"'$$[$kRaw]'")
              else if (kRaw.startsWith("'") && kRaw.length >= 2) {
                val k = kRaw.substring(1, kRaw.length - 1)
                if (k.startsWith("$")) Some(kRaw) else Some(s"'$$.$k'")
              } else None // lambda body / expression key: skip
            if (l.isEmpty || badLeft || badRight || path.isEmpty) skip()
            else {
              val fn = if (isText) "json_extract_string" else "json_extract"
              cur = cur.substring(0, ls) +
                s"$fn($l, ${path.get})" + cur.substring(re)
              applied = true
            }
          }
        }
      }
      if (!applied) return if (changed) Some(cur) else None
      changed = true
    }
    if (changed) Some(cur) else None
  }

  private val filterShorthandRe =
    "(?i)\\bFILTER\\s*\\(\\s*(?!WHERE\\b)".r

  /** DuckDB's `agg(x) FILTER (cond)` shorthand (no WHERE keyword) →
    * Spark's `FILTER (WHERE cond)`. Parse-failure only — a scalar
    * `filter(arr, fn)` call that parses natively never reaches the
    * chain, and inside the chain a corrupted splice of one simply
    * fails to re-parse (dead candidate branch).
    */
  def rewriteFilterShorthand(text: String): Option[String] = {
    val m = ReplaceRewrite.maskLiterals(text)
    val hits = filterShorthandRe.findAllMatchIn(m).toList
    if (hits.isEmpty) return None
    val sb = new StringBuilder
    var pos = 0
    hits.foreach { h =>
      sb.append(text.substring(pos, h.end)).append("WHERE ")
      pos = h.end
    }
    sb.append(text.substring(pos))
    Some(sb.toString)
  }

  private val windowFilterRe = "(?i)\\bFILTER\\s*\\(".r
  private val nullSkippingAggs =
    Set("count", "sum", "avg", "min", "max", "mean", "total")

  /** `agg(x) FILTER (WHERE p) OVER w` → `agg(CASE WHEN p THEN x END)
    * OVER w` (round 20, verdict-19 #2). Spark PARSES the clause but its
    * analyzer throws _LEGACY_ERROR_TEMP_1030 ("Window aggregate
    * function with filter predicate is not supported yet") from a
    * built-in resolution rule — before any injected rule could rewrite
    * the node — so the fold must claim pre-delegation, like `**`. The
    * CASE form is exactly the host's semantics for the NULL-skipping
    * aggregates (count/sum/avg/min/max: a row failing p contributes
    * NULL, which they ignore); count(*) counts `CASE WHEN p THEN 1
    * END`. Anything else (DISTINCT args, multi-arg or NULL-honoring
    * aggregates) declines untouched and keeps Spark's loud error. Only
    * a FILTER directly preceded by `)` (the aggregate call) and
    * directly followed by OVER is a window clause — grouped-aggregate
    * FILTER parses natively and never enters here; scalar filter(a, f)
    * has no `)` before it.
    */
  def rewriteWindowFilter(text: String): Option[String] = {
    var cur = text
    var changed = false
    var rounds = 0
    var progress = true
    while (progress && rounds < 64) {
      rounds += 1
      progress = false
      val m = ReplaceRewrite.maskLiterals(cur)
      val hits = windowFilterRe.findAllMatchIn(m).toList
      var done = false
      for (h <- hits if !done) {
        val rewritten: Option[String] = {
          // previous non-ws char must close the aggregate call
          var i = h.start - 1
          while (i >= 0 && cur.charAt(i).isWhitespace) i -= 1
          if (i < 0 || m.charAt(i) != ')') None
          else {
            val aggClose = i
            val open = h.end - 1 // the FILTER clause's '('
            val close = ReplaceRewrite.closeOf(cur, open)
            if (close < 0) None
            else {
              var a = close
              while (a < cur.length && cur.charAt(a).isWhitespace) a += 1
              val overNext = a + 4 <= m.length &&
                m.substring(a, a + 4).equalsIgnoreCase("OVER") &&
                (a + 4 == m.length || !(m.charAt(a + 4).isLetterOrDigit ||
                  m.charAt(a + 4) == '_'))
              if (!overNext) None
              else {
                // backward balanced scan to the aggregate's '('
                var depth = 1
                var j = aggClose - 1
                while (j >= 0 && depth > 0) {
                  m.charAt(j) match {
                    case ')' => depth += 1
                    case '(' => depth -= 1
                    case _ =>
                  }
                  j -= 1
                }
                if (depth != 0) None
                else {
                  val aggOpen = j + 1
                  var k = j
                  while (k >= 0 && cur.charAt(k).isWhitespace) k -= 1
                  val nameEnd = k
                  while (k >= 0 && (cur.charAt(k).isLetterOrDigit ||
                    cur.charAt(k) == '_')) k -= 1
                  val name = cur.substring(k + 1, nameEnd + 1)
                  val nameStart = k + 1
                  val arg = cur.substring(aggOpen + 1, aggClose).trim
                  val argMask = m.substring(aggOpen + 1, aggClose)
                  val topComma = {
                    var d = 0; var c = false
                    argMask.foreach {
                      case '(' => d += 1
                      case ')' => d -= 1
                      case ',' if d == 0 => c = true
                      case _ =>
                    }
                    c
                  }
                  val distinctArg =
                    "(?i)\\ADISTINCT\\b".r.findFirstIn(arg).isDefined
                  if (!nullSkippingAggs(name.toLowerCase) || topComma ||
                    distinctArg) None
                  else {
                    var pred = cur.substring(open + 1, close - 1).trim
                    pred = "(?i)\\AWHERE\\b".r
                      .findFirstIn(pred) match {
                        case Some(w) => pred.substring(w.length).trim
                        case None => pred
                      }
                    if (pred.isEmpty) None
                    else {
                      val isCountStar = name.equalsIgnoreCase("count") &&
                        (arg == "*" || arg.isEmpty || arg == "1")
                      val body =
                        if (isCountStar) s"CASE WHEN $pred THEN 1 END"
                        else s"CASE WHEN $pred THEN $arg END"
                      Some(cur.substring(0, nameStart) +
                        s"$name($body)" + cur.substring(close))
                    }
                  }
                }
              }
            }
          }
        }
        rewritten.foreach { r =>
          cur = r; changed = true; progress = true; done = true
        }
      }
    }
    if (changed) Some(cur) else None
  }

  private val quantRe =
    "(?i)(==|=|<>|!=|<=|>=|<|>)\\s*(ANY|ALL|SOME)\\s*\\(".r

  /** `l <op> ANY|SOME|ALL (list)` → exists/forall with the comparison
    * in the lambda. Subquery operands decline (the host demands IN).
    */
  def rewriteQuantified(text: String): Option[String] = {
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      val hit = quantRe.findFirstMatchIn(m) match {
        case Some(h) => h
        case None => return if (changed) Some(cur) else None
      }
      val open = m.indexOf('(', hit.end - 1)
      val close = ReplaceRewrite.closeOf(cur, open)
      if (close < 0) return None
      val inner = cur.substring(open + 1, close - 1).trim
      if (inner.toUpperCase.startsWith("SELECT") ||
        inner.toUpperCase.startsWith("WITH") ||
        inner.toUpperCase.startsWith("FROM")) return None
      val ls = scanLeft(cur, m, hit.start - 1).getOrElse(return None)
      if (!neighborsSafe(cur, m, ls, close)) return None
      val l = cur.substring(ls, hit.start).trim
      if (l.isEmpty) return None
      val op = hit.group(1)
      val fn = if (hit.group(2).equalsIgnoreCase("ALL")) "forall" else "exists"
      cur = cur.substring(0, ls) +
        s"$fn($inner, __graft_t -> ($l) $op __graft_t)" +
        cur.substring(close)
      changed = true
    }
    if (changed) Some(cur) else None
  }

  private val ignoreNullsInParensRe =
    "(?i)\\s+(IGNORE|RESPECT)\\s+NULLS\\s*\\)".r

  /** `fn(x IGNORE NULLS)` → `fn(x) IGNORE NULLS` (Spark's suffix
    * grammar position). Parse-failure only.
    */
  def rewriteIgnoreNulls(text: String): Option[String] = {
    val m = ReplaceRewrite.maskLiterals(text)
    val hits = ignoreNullsInParensRe.findAllMatchIn(m).toList
    if (hits.isEmpty) return None
    val sb = new StringBuilder
    var pos = 0
    hits.foreach { h =>
      sb.append(text.substring(pos, h.start))
        .append(") ").append(h.group(1).toUpperCase).append(" NULLS")
      pos = h.end
    }
    sb.append(text.substring(pos))
    Some(sb.toString)
  }

  /** Postfix factorial `x!` (round-18 eighth sweep) → graft_factorial
    * (ScalarCompat.duckFactorial — DuckDB's exact-integer semantics,
    * (-n)! = 1, identical 0..33 domain). Parse-failure only: Spark has
    * no postfix operator, and `!=` / prefix-NOT occurrences are
    * excluded by the neighbor guards (a `!` directly followed by `=`
    * or preceding an operand is not postfix).
    */
  def rewriteFactorial(text: String): Option[String] = {
    if (!text.contains("!")) return None
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      var i = 0
      var applied = false
      while (i < m.length && !applied) {
        if (m.charAt(i) == '!' &&
          (i + 1 >= m.length || m.charAt(i + 1) != '=') &&
          (i == 0 || m.charAt(i - 1) != '!')) {
          // postfix: an operand must END directly before the `!`
          val lsOpt = scanLeft(cur, m, i - 1)
          lsOpt match {
            case Some(ls) if cur.substring(ls, i).trim.nonEmpty &&
                !clauseKeywords(cur.substring(ls, i).trim.toLowerCase) &&
                neighborsSafe(cur, m, ls, i + 1) =>
              val a = cur.substring(ls, i).trim
              cur = cur.substring(0, ls) + s"graft_factorial($a)" +
                cur.substring(i + 1)
              applied = true
            case _ => i += 1
          }
        } else i += 1
      }
      if (!applied) return if (changed) Some(cur) else None
      changed = true
    }
    if (changed) Some(cur) else None
  }

  /** Prefix absolute-value `@x` (round-18) → abs(x). Skips `@>` / `<@`
    * (the containment operators, rewritten by [[rewriteOps]]).
    * Parse-failure only — `@` is not a Spark SQL token.
    */
  def rewriteAbsOp(text: String): Option[String] = {
    if (!text.contains("@")) return None
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      var i = 0
      var applied = false
      while (i < m.length && !applied) {
        if (m.charAt(i) == '@' &&
          (i + 1 >= m.length || m.charAt(i + 1) != '>') &&
          (i == 0 || (m.charAt(i - 1) != '<' && !wordChar(m.charAt(i - 1))))) {
          scanRight(cur, m, i + 1) match {
            case Some(re) if neighborsSafe(cur, m, i, re) =>
              val b = cur.substring(i + 1, re).trim
              if (b.isEmpty) i += 1
              else {
                cur = cur.substring(0, i) + s"abs($b)" + cur.substring(re)
                applied = true
              }
            case _ => i += 1
          }
        } else i += 1
      }
      if (!applied) return if (changed) Some(cur) else None
      changed = true
    }
    if (changed) Some(cur) else None
  }

  private val intervalExprRe = "(?i)\\bINTERVAL\\s*\\(".r
  private val intervalUnits = Map(
    "year" -> "to_years", "month" -> "to_months", "week" -> "to_weeks",
    "day" -> "to_days", "hour" -> "to_hours", "minute" -> "to_minutes",
    "second" -> "to_seconds", "millisecond" -> "to_milliseconds",
    "microsecond" -> "to_microseconds", "decade" -> "to_decades",
    "century" -> "to_centuries", "centuries" -> "to_centuries",
    "millennium" -> "to_millennia", "millennia" -> "to_millennia")

  /** DuckDB's non-literal interval constructor `INTERVAL (expr) UNIT`
    * (round 18) → the engine's to_<unit>s() constructors (registered
    * aliases over MakeDTInterval/MakeYMInterval, so month-end clamping
    * and fractional seconds match). Spark's INTERVAL grammar only
    * takes literals — parse-failure only.
    */
  /** DuckDB's bare clock interval literal `INTERVAL '1:02:03[.frac]'`
    * (hours may exceed 24, sign allowed — host-probed; `'1:02'` is a
    * host error too). Spark needs the HOUR TO SECOND qualifier spelled
    * out; appending it is value-identical. Parse-failure only
    * (INVALID_TYPED_LITERAL).
    */
  private val clockIntervalRe =
    "(?i)\\bINTERVAL\\s*('-?\\d+:\\d{1,2}:\\d{1,2}(?:\\.\\d+)?')".r
  def rewriteIntervalClock(text: String): Option[String] = {
    val m = ReplaceRewrite.maskLiterals(text)
    // literals are masked, so match positions come from the raw text
    // guarded by the INTERVAL keyword being unmasked in m
    val hits = clockIntervalRe.findAllMatchIn(text).filter { h =>
      m.regionMatches(true, h.start, "INTERVAL", 0, 8) &&
        // not already qualified: next word after the literal must not
        // be a unit keyword
        !"(?i)\\A\\s*(HOUR|MINUTE|SECOND|DAY|MONTH|YEAR|WEEK)"
          .r.findFirstIn(text.substring(h.end)).isDefined
    }.toList
    if (hits.isEmpty) return None
    val sb = new StringBuilder
    var pos = 0
    hits.foreach { h =>
      sb.append(text.substring(pos, h.start))
        .append(s"INTERVAL ${h.group(1)} HOUR TO SECOND")
      pos = h.end
    }
    sb.append(text.substring(pos))
    Some(sb.toString)
  }

  def rewriteIntervalExpr(text: String): Option[String] = {
    val m0 = ReplaceRewrite.maskLiterals(text)
    val hits = intervalExprRe.findAllMatchIn(m0).toList
    if (hits.isEmpty) return None
    val sb = new StringBuilder
    var pos = 0
    var changed = false
    for (h <- hits if h.start >= pos) {
      val open = m0.indexOf('(', h.start)
      val close = ReplaceRewrite.closeOf(text, open) // index AFTER ')'
      if (close > 0) {
        var u = close
        while (u < text.length && text.charAt(u).isWhitespace) u += 1
        var ue = u
        while (ue < text.length && text.charAt(ue).isLetter) ue += 1
        val unitWord = text.substring(u, ue).toLowerCase
        val unit = intervalUnits.get(unitWord)
          .orElse(intervalUnits.get(unitWord.stripSuffix("s")))
        unit match {
          case Some(fn) =>
            val inner = text.substring(open + 1, close - 1)
            sb.append(text.substring(pos, h.start)).append(s"$fn($inner)")
            pos = ue
            changed = true
          case None => // INTERVAL (literal) without a unit etc: leave
        }
      }
    }
    if (!changed) return None
    sb.append(text.substring(pos))
    Some(sb.toString)
  }

  private val unnestBraceRe = "(?i)\\bunnest\\s*\\(\\s*\\{".r

  /** `unnest({...struct literal...})` (round 18) — DuckDB expands a
    * struct argument into one column per field; Spark's explode only
    * takes arrays/maps. inline(array(struct)) produces exactly the
    * per-field columns. Only the textually-decidable brace-literal
    * form is claimed (a struct-typed column reference parses natively
    * into explode and keeps Spark's own analysis error).
    */
  def rewriteUnnestStruct(text: String): Option[String] = {
    val m0 = ReplaceRewrite.maskLiterals(text)
    val hits = unnestBraceRe.findAllMatchIn(m0).toList
    if (hits.isEmpty) return None
    val sb = new StringBuilder
    var pos = 0
    for (h <- hits if h.start >= pos) {
      val open = m0.indexOf('(', h.start)
      val close = ReplaceRewrite.closeOf(text, open)
      if (close < 0) return None
      val inner = text.substring(open + 1, close - 1)
      sb.append(text.substring(pos, h.start))
        .append(s"inline(array($inner))")
      pos = close
    }
    sb.append(text.substring(pos))
    Some(sb.toString)
  }

  /** DuckDB's JSON casts (round 18): `x::JSON` and [TRY_]CAST(x AS
    * JSON) → graft_json_cast[_try] (functions/JsonBuild.JsonCastExpr —
    * strings validate-and-pass-through, other types convert to JSON
    * text). Parse-failure only: JSON is UNSUPPORTED_DATATYPE in Spark.
    */
  def rewriteJsonCast(text: String): Option[String] = {
    if (!"(?i)\\bJSON\\b".r.findFirstIn(text).isDefined) return None
    var cur = text
    var m = ReplaceRewrite.maskLiterals(cur)
    var changed = false

    val castRe = """(?i)\b(TRY_)?CAST\s*\(""".r
    var scan = true
    while (scan) {
      scan = false
      for (h <- castRe.findAllMatchIn(m) if !scan) {
        val open = m.indexOf('(', h.start)
        val close = ReplaceRewrite.closeOf(cur, open)
        if (close > 0) {
          val inner = cur.substring(open + 1, close - 1)
          val innerM = m.substring(open + 1, close - 1)
          val asRe = """(?i)\bAS\s+JSON\s*\z""".r
          asRe.findFirstMatchIn(innerM).foreach { am =>
            val operand = inner.substring(0, am.start).trim
            if (operand.nonEmpty) {
              val fn = if (h.group(1) != null) "graft_json_try_cast"
                else "graft_json_cast"
              cur = cur.substring(0, h.start) + s"$fn($operand)" +
                cur.substring(close)
              m = ReplaceRewrite.maskLiterals(cur)
              changed = true
              scan = true
            }
          }
        }
      }
    }

    val colonRe = """(?i)::\s*JSON\b""".r
    var again = true
    while (again) {
      again = false
      for (h <- colonRe.findAllMatchIn(m) if !again) {
        scanLeft(cur, m, h.start - 1) match {
          case Some(ls) =>
            val operand = cur.substring(ls, h.start).trim
            if (operand.nonEmpty) {
              cur = cur.substring(0, ls) + s"graft_json_cast($operand)" +
                cur.substring(h.end)
              m = ReplaceRewrite.maskLiterals(cur)
              changed = true
              again = true
            }
          case None =>
        }
      }
    }
    if (changed) Some(cur) else None
  }

  private val limitPctRe =
    "(?is)\\bLIMIT\\s+(\\d+(?:\\.\\d+)?)\\s*%\\s*;?\\s*\\z".r

  /** Trailing `ORDER BY <keys> LIMIT <p>%` → row_number/count window
    * wrap keeping floor(n·p/100) rows. Requires the ORDER BY; ordinal
    * sort keys decline (they would be constants inside OVER).
    */
  /** DuckDB's `expr GLOB 'pattern'` operator (round-20 thirteenth
    * sweep) — case-sensitive glob match (`*`/`?`/`[set]`), which Spark
    * has no spelling for (unrewritten it's a parse error, never a
    * silent misparse). Lands on the registered graft_glob scalar
    * (ScalarCompat.globMatch). `NOT GLOB` is a parser error on the
    * host too, so only the plain operator rewrites.
    */
  private val globWordRe = "(?i)\\bGLOB\\b".r
  def rewriteGlob(text: String): Option[String] = {
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 32) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      val hit = globWordRe.findFirstMatchIn(m).getOrElse(
        return if (changed) Some(cur) else None)
      val re = scanRight(cur, m, hit.end).getOrElse(return None)
      val ls = scanLeft(cur, m, hit.start - 1).getOrElse(return None)
      val a = cur.substring(ls, hit.start).trim
      val b = cur.substring(hit.end, re).trim
      if (a.isEmpty || b.isEmpty) return None
      cur = cur.substring(0, ls) + s"graft_glob($a, $b)" + cur.substring(re)
      changed = true
    }
    if (changed) Some(cur) else None
  }

  /** ANSI fetch syntax (round-20 fourteenth probe — the host executes
    * it, Spark's grammar has only LIMIT/OFFSET): `[OFFSET k ROW[S]]
    * FETCH FIRST|NEXT [n] ROW[S] ONLY` → `LIMIT n [OFFSET k]` (count
    * defaults to 1 per the standard), and a bare `OFFSET k ROWS` drops
    * the ROWS word. Parse-failure only; window-frame ROWS can't match
    * (no OFFSET/FETCH adjacency).
    */
  private val fetchRe =
    ("(?is)\\b(?:OFFSET\\s+(\\d+)\\s+ROWS?\\s+)?" +
      "FETCH\\s+(?:FIRST|NEXT)\\s+(?:(\\d+)\\s+)?ROWS?\\s+ONLY").r
  private val bareOffsetRowsRe = "(?is)\\bOFFSET\\s+(\\d+)\\s+ROWS?\\b".r
  def rewriteFetch(text: String): Option[String] = {
    val m = ReplaceRewrite.maskLiterals(text)
    fetchRe.findFirstMatchIn(m) match {
      case Some(h) =>
        val off = Option(h.group(1)).map(k => s" OFFSET $k").getOrElse("")
        val n = Option(h.group(2)).getOrElse("1")
        Some(text.substring(0, h.start) + s"LIMIT $n$off" +
          text.substring(h.end))
      case None =>
        bareOffsetRowsRe.findFirstMatchIn(m).map(h =>
          text.substring(0, h.start) + s"OFFSET ${h.group(1)}" +
            text.substring(h.end))
    }
  }

  /** DuckDB's function-chaining syntax `expr.fn(args)` ≡ `fn(expr,
    * args)` (round-20 thirteenth sweep) for receivers that END
    * unambiguously — a closing paren (`('hello').upper()`,
    * `trim(x).len()`), a string literal (`'abc'.upper()`), or a bracket
    * list (`[1,2].len()` — via the bracket rewrite's array() form).
    * Bare-identifier receivers (`col.lower()`) are NOT claimed: they
    * parse natively as qualified names, so a textual rewrite could
    * shadow a real `schema.function()` call. Chains resolve
    * leftmost-first, so the rewritten call becomes the next round's
    * receiver. Parse-failure only.
    */
  private val dotCallRe = "\\.\\s*([A-Za-z_]\\w*)\\s*\\(".r
  def rewriteDotCall(text: String): Option[String] = {
    var cur = text
    var changed = false
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val m = ReplaceRewrite.maskLiterals(cur)
      val hitOpt = dotCallRe.findAllMatchIn(m).find { h =>
        var p = h.start - 1
        while (p >= 0 && cur.charAt(p).isWhitespace) p -= 1
        p >= 0 && (m.charAt(p) == ')' || m.charAt(p) == ']' ||
          (cur.charAt(p) == '\'' && m.charAt(p) == ' '))
      }
      val hit = hitOpt.getOrElse(return if (changed) Some(cur) else None)
      var p = hit.start - 1
      while (p >= 0 && cur.charAt(p).isWhitespace) p -= 1
      val ls = scanLeft(cur, m, p).getOrElse(return None)
      val receiver = cur.substring(ls, p + 1)
      val fn = hit.group(1)
      val open = hit.end - 1
      val close = ReplaceRewrite.closeOf(cur, open)
      if (close < 0) return None
      val args = cur.substring(open + 1, close - 1).trim
      val call =
        if (args.isEmpty) s"$fn($receiver)" else s"$fn($receiver, $args)"
      cur = cur.substring(0, ls) + call + cur.substring(close)
      changed = true
    }
    if (changed) Some(cur) else None
  }

  def rewriteLimitPercent(text: String): Option[String] = {
    val m = ReplaceRewrite.maskLiterals(text)
    val hit = limitPctRe.findFirstMatchIn(m).getOrElse(return None)
    val pct = hit.group(1)
    val words = QualifyRewrite.topLevelWords(text)
    // the LIMIT must be top-level (not inside a subquery)
    val limW = words.reverse.find(w => w._1 == "LIMIT").getOrElse(return None)
    if (limW._2 != hit.start) return None
    val ordW = words.filter(w => w._1 == "ORDER" && w._2 < hit.start)
      .lastOption
    ordW match {
      case Some(ow) =>
        val keys = text.substring(ow._2, hit.start).trim
          .replaceFirst("(?i)\\Aorder\\s+by\\b", "").trim
        if (keys.isEmpty) return None
        if (ReplaceRewrite.splitTop(keys).map(_.trim)
          .exists(k => k.split("\\s+").headOption.exists(_.matches("\\d+"))))
          return None // ordinal keys: constants inside OVER
        val body = text.substring(0, ow._2).trim
        if (body.isEmpty) return None
        Some(
          s"SELECT * EXCEPT (__graft_rn, __graft_n) FROM ( " +
            s"SELECT *, row_number() OVER (ORDER BY $keys) AS __graft_rn, " +
            s"count(*) OVER () AS __graft_n FROM ( $body ) __graft_lp ) " +
            s"WHERE __graft_rn <= floor(__graft_n * $pct / 100.0) " +
            s"ORDER BY $keys")
      case None =>
        // No ORDER BY: the host still takes floor(n*pct/100) rows, an
        // arbitrary subset — mirror with an unordered row_number()
        // (round-20 thirteenth sweep; floor semantics probed:
        // 25% of 10 → 2 rows, 10% of 3 → 0 rows).
        val body = text.substring(0, hit.start).trim
        if (body.isEmpty) return None
        Some(
          s"SELECT * EXCEPT (__graft_rn, __graft_n) FROM ( " +
            s"SELECT *, row_number() OVER (ORDER BY " +
            s"monotonically_increasing_id()) AS __graft_rn, " +
            s"count(*) OVER () AS __graft_n FROM ( $body ) __graft_lp ) " +
            s"WHERE __graft_rn <= floor(__graft_n * $pct / 100.0)")
    }
  }
}
