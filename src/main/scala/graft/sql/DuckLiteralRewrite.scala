package graft.sql

import scala.util.control.NonFatal

/** Mechanical rewrite of DuckDB's bracket-and-brace literal syntax —
  * the friendly-SQL surface a pasted script leans on hardest after
  * EXCLUDE/QUALIFY:
  *
  * {{{
  * SELECT [1, 2, 3]                           -- list literal  → array(1, 2, 3)
  * SELECT ARRAY[1, 2]                         -- PG spelling    → array(1, 2)
  * SELECT {'a': 1, 'b': x}                    -- struct literal → named_struct('a', 1, 'b', x)
  * SELECT MAP {'a': 1}                        -- map literal    → map('a', 1)
  * SELECT [x * 2 FOR x IN xs IF x > 1]        -- comprehension  → transform(filter(xs, x -> x > 1), x -> x * 2)
  * SELECT l[2], l[-1], s['key']               -- 1-based index  → duck_index(l, 2) …
  * SELECT l[2:3], l[-3:], t[:2]               -- inclusive slice→ duck_slice(l, 2, 3) …
  * }}}
  *
  * None of these parse in Spark — `[`/`{` in an expression position is
  * a ParseException — so the rewrite runs purely inside the hint
  * parser's failure chain and can never claim a statement stock Spark
  * understands. That boundary carries the semantic choice for the ONE
  * overlapping spelling: postfix `x[i]` parses natively in Spark
  * (0-based) and such statements never reach this rewrite; a statement
  * that ALSO contains DuckDB-only literal syntax is DuckDB dialect, so
  * its postfix brackets get DuckDB's 1-based / NULL-out-of-bounds
  * semantics ([[graft.functions.DuckIndex]]) — rewriting them to
  * Spark's 0-based `[]` would be a silent off-by-one on every pasted
  * script, the worst failure mode.
  *
  * The scanner is quote/comment-aware (same contract as
  * [[QualifyRewrite.allWords]]) and recursive: nested literals,
  * comprehensions inside slices, struct values holding lists all
  * compose. Shapes it cannot place — a postfix bracket whose receiver
  * it cannot delimit (e.g. following an unbalanced construct) — decline
  * the whole statement (None), falling through to the landing-pad hint.
  */
object DuckLiteralRewrite {

  /** Cheap guard: a `[` or `{` outside strings/quoted idents/comments. */
  def isShaped(sql: String): Boolean = {
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        case '[' | '{' => return true
        case '\'' =>
          i += 1
          var done = false
          while (i < n && !done) {
            if (sql.charAt(i) == '\'') {
              if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
              else done = true
            } else i += 1
          }
          i += 1
        case '"' => i += 1; while (i < n && sql.charAt(i) != '"') i += 1; i += 1
        case '`' => i += 1; while (i < n && sql.charAt(i) != '`') i += 1; i += 1
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i += 2
        case _ => i += 1
      }
    }
    false
  }

  private case class Decline(why: String) extends RuntimeException(why)

  /** Words after which a `[` opens a LITERAL (expression position), not
    * a postfix index on the word. Bare identifiers not in this set are
    * treated as index receivers.
    */
  private val exprPositionWords = Set(
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "IN", "IS", "LIKE",
    "ILIKE", "BETWEEN", "THEN", "WHEN", "ELSE", "CASE", "END", "ON",
    "BY", "AS", "HAVING", "LIMIT", "OFFSET", "SET", "VALUES", "RETURN",
    "RETURNS", "UNION", "ALL", "EXCEPT", "INTERSECT", "DISTINCT", "IF",
    "QUALIFY", "GROUP", "ORDER", "WITH", "OVER", "PARTITION", "ESCAPE",
    "FOR")
  // END is ambiguous (CASE ... END[1] would be postfix) — DuckDB itself
  // requires parens there; keeping END on the literal side matches the
  // common paste `ELSE [] END`.

  def rewrite(sql: String): Option[String] =
    try {
      val out = transform(sql)
      if (out == sql) None else Some(out)
    } catch {
      case _: Decline => None
      case NonFatal(_) => None
    }

  /** Recursively rewrite every bracket/brace construct in `s`. */
  private def transform(s: String): String = {
    val out = new StringBuilder
    // (uppercased word, start offset IN OUT) of the last bare word emitted.
    var lastWord: (String, Int) = null
    var lastSig: Char = 0 // last significant char emitted
    var i = 0
    val n = s.length
    def copyString(): Unit = { // '...' with '' escapes, verbatim
      out.append('\''); i += 1
      var done = false
      while (i < n && !done) {
        if (s.charAt(i) == '\'') {
          if (i + 1 < n && s.charAt(i + 1) == '\'') { out.append("''"); i += 2 }
          else { out.append('\''); i += 1; done = true }
        } else { out.append(s.charAt(i)); i += 1 }
      }
      lastSig = '\''
    }
    def copyQuoted(q: Char): Unit = {
      out.append(q); i += 1
      while (i < n && s.charAt(i) != q) { out.append(s.charAt(i)); i += 1 }
      if (i < n) { out.append(q); i += 1 }
      lastSig = q
    }
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\'' => copyString()
        case '"' => copyQuoted('"')
        case '`' => copyQuoted('`')
        case '-' if i + 1 < n && s.charAt(i + 1) == '-' =>
          while (i < n && s.charAt(i) != '\n') { out.append(s.charAt(i)); i += 1 }
        case '/' if i + 1 < n && s.charAt(i + 1) == '*' =>
          out.append("/*"); i += 2
          while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) {
            out.append(s.charAt(i)); i += 1
          }
          if (i + 1 < n) { out.append("*/"); i += 2 }
        case '[' =>
          val inner = sliceGroup(s, i, '[', ']')
          i += inner.length + 2
          val literalPos =
            if (lastSig == 0) true
            else if (lastSig == ')' || lastSig == ']' || lastSig == '\'' ||
              lastSig == '"' || lastSig == '`') false
            else if (lastSig.isLetterOrDigit || lastSig == '_')
              lastWord != null && exprPositionWords(lastWord._1)
            else true // operator, comma, paren-open, colon, …
          if (literalPos) {
            out.append(rewriteLiteralBracket(inner))
          } else if (lastWord != null && lastWord._1 == "ARRAY" &&
            out.substring(lastWord._2).matches("(?is)ARRAY\\s*")) {
            // PG/DuckDB `ARRAY[1, 2]` — drop the keyword, emit array().
            out.setLength(lastWord._2)
            out.append(rewriteLiteralBracket(inner))
          } else {
            val rStart = receiverStart(out)
            val recv = out.substring(rStart)
            out.setLength(rStart)
            out.append(rewritePostfixBracket(recv, inner))
          }
          lastSig = ')'; lastWord = null
        case '{' =>
          val inner = sliceGroup(s, i, '{', '}')
          i += inner.length + 2
          val isMap = lastWord != null && lastWord._1 == "MAP" &&
            out.substring(lastWord._2).matches("(?is)MAP\\s*")
          if (isMap) out.setLength(lastWord._2)
          out.append(rewriteBrace(inner, isMap))
          lastSig = ')'; lastWord = null
        case ch if ch.isLetter || ch == '_' =>
          val start = i
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          val w = s.substring(start, i)
          lastWord = (w.toUpperCase, out.length)
          out.append(w)
          lastSig = w.last
        case ch =>
          out.append(ch); i += 1
          if (!ch.isWhitespace) { lastSig = ch; if (!ch.isDigit) lastWord = null }
      }
    }
    out.toString
  }

  /** Contents between the group opener at `start` and its matching
    * closer — quote-aware, any nesting of (), [], {}.
    */
  private def sliceGroup(s: String, start: Int, open: Char, close: Char): String = {
    var i = start + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var done = false
          while (i < n && !done) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2
              else { done = true; i += 1 }
            } else i += 1
          }
        case '"' => i += 1; while (i < n && s.charAt(i) != '"') i += 1; i += 1
        case '`' => i += 1; while (i < n && s.charAt(i) != '`') i += 1; i += 1
        case '(' | '[' | '{' => depth += 1; i += 1
        case ')' | ']' | '}' => depth -= 1; i += 1
        case _ => i += 1
      }
    }
    if (depth != 0) throw Decline(s"unbalanced $open")
    s.substring(start + 1, i - 1)
  }

  /** Split `s` at top-level occurrences of `sep` (quote/group-aware).
    * With `word = true`, `sep` must be a bare word (case-insensitive);
    * otherwise a single char. Returns the pieces (separators dropped).
    */
  private def splitTop(s: String, sep: String, word: Boolean): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var depth = 0
    var last = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\'' =>
          i += 1
          var done = false
          while (i < n && !done) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2
              else { done = true; i += 1 }
            } else i += 1
          }
        case '"' => i += 1; while (i < n && s.charAt(i) != '"') i += 1; i += 1
        case '`' => i += 1; while (i < n && s.charAt(i) != '`') i += 1; i += 1
        case '(' | '[' | '{' => depth += 1; i += 1
        case ')' | ']' | '}' => depth -= 1; i += 1
        case ch if word && depth == 0 && (ch.isLetter || ch == '_') =>
          val start = i
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          if (s.substring(start, i).equalsIgnoreCase(sep) &&
            (start == 0 || !s.charAt(start - 1).isLetterOrDigit)) {
            out += s.substring(last, start); last = i
          }
        case ch if !word && depth == 0 && ch == sep.charAt(0) =>
          // `::` (cast) and `:=` (named arg) are not the slice colon.
          if (sep == ":" && ((i + 1 < n && (s.charAt(i + 1) == ':' ||
            s.charAt(i + 1) == '=')) || (i > 0 && s.charAt(i - 1) == ':')))
            i += 1
          else { out += s.substring(last, i); last = i + 1; i += 1 }
        case _ => i += 1
      }
    }
    out += s.substring(last)
    out.result()
  }

  /** A literal-position bracket: list literal or comprehension. */
  private def rewriteLiteralBracket(inner: String): String = {
    val forParts = splitTop(inner, "FOR", word = true)
    if (forParts.length == 2) {
      // [expr FOR var IN src [IF cond]]
      val expr = transform(forParts(0).trim)
      val tail = forParts(1)
      val inParts = splitTop(tail, "IN", word = true)
      if (inParts.length != 2) throw Decline("comprehension without IN")
      val v = inParts(0).trim
      if (!v.matches("[A-Za-z_][A-Za-z0-9_]*"))
        throw Decline(s"comprehension variable '$v'")
      val ifParts = splitTop(inParts(1), "IF", word = true)
      val src = transform(ifParts(0).trim)
      if (ifParts.length == 1)
        s"transform($src, $v -> ($expr))"
      else if (ifParts.length == 2) {
        val cond = transform(ifParts(1).trim)
        s"transform(filter($src, $v -> ($cond)), $v -> ($expr))"
      } else throw Decline("multiple IF in comprehension")
    } else if (forParts.length == 1) {
      val items = splitTop(inner, ",", word = false).map(_.trim)
      if (items == Vector("")) "array()"
      else "array(" + items.map(transform).mkString(", ") + ")"
    } else throw Decline("multiple FOR in comprehension")
  }

  /** A postfix bracket on `recv`: index or slice. */
  private def rewritePostfixBracket(recv: String, inner: String): String = {
    val parts = splitTop(inner, ":", word = false)
    if (parts.length == 1)
      s"duck_index($recv, ${transform(inner.trim)})"
    else if (parts.length == 2) {
      val b = parts(0).trim
      val e = parts(1).trim
      val bT = if (b.isEmpty) "CAST(NULL AS BIGINT)" else transform(b)
      val eT = if (e.isEmpty) "CAST(NULL AS BIGINT)" else transform(e)
      s"duck_slice($recv, $bT, $eT)"
    } else throw Decline("multiple ':' in slice")
  }

  /** `{'k': v, ...}` → named_struct / map literal. */
  private def rewriteBrace(inner: String, isMap: Boolean): String = {
    val fn = if (isMap) "map" else "named_struct"
    if (inner.trim.isEmpty) {
      if (isMap) "map()" else throw Decline("empty struct literal")
    } else {
      val pairs = splitTop(inner, ",", word = false).map { p =>
        val kv = splitTop(p, ":", word = false)
        if (kv.length != 2) throw Decline("struct pair without ':'")
        val k = kv(0).trim
        // Struct keys are NAMES (string-quoted or bare identifiers);
        // map keys are arbitrary expressions (MAP {1: 'a'} is valid
        // DuckDB), recursively transformed like the values.
        val key =
          if (k.startsWith("'") && k.endsWith("'") && k.length >= 2) k
          else if (k.matches("[A-Za-z_][A-Za-z0-9_]*")) s"'$k'"
          else if (isMap) transform(k)
          else throw Decline(s"struct key '$k'")
        s"$key, ${transform(kv(1).trim)}"
      }
      fn + "(" + pairs.mkString(", ") + ")"
    }
  }

  /** Start offset (in `out`) of the maximal trailing primary expression:
    * dotted identifiers, quoted identifiers, a string literal, or a
    * balanced call/paren group, possibly chained (`f(x)`, `a.b`,
    * `t.`m``, `duck_index(...)` from an earlier rewrite). Declines when
    * nothing receiver-shaped precedes the bracket.
    */
  private def receiverStart(out: StringBuilder): Int = {
    var j = out.length - 1
    while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
    if (j < 0) throw Decline("bracket with no receiver")
    var end = j + 1 // exclusive end of receiver (trailing ws excluded)
    def declineIf(cond: Boolean, why: String): Unit =
      if (cond) throw Decline(why)
    var expectMore = true
    while (expectMore && j >= 0) {
      val c = out.charAt(j)
      if (c.isLetterOrDigit || c == '_' || c == '$') {
        while (j >= 0 && (out.charAt(j).isLetterOrDigit ||
          out.charAt(j) == '_' || out.charAt(j) == '$')) j -= 1
      } else if (c == '`' || c == '"') {
        val q = c; j -= 1
        while (j >= 0 && out.charAt(j) != q) j -= 1
        declineIf(j < 0, "unbalanced quoted identifier"); j -= 1
      } else if (c == '\'') {
        j -= 1
        while (j >= 0 && out.charAt(j) != '\'') j -= 1
        declineIf(j < 0, "unbalanced string")
        // '' escapes make backward string scans ambiguous — decline.
        declineIf(j > 0 && out.charAt(j - 1) == '\'', "escaped quote receiver")
        j -= 1
      } else if (c == ')') {
        var depth = 1; j -= 1
        while (j >= 0 && depth > 0) {
          out.charAt(j) match {
            case '\'' =>
              j -= 1
              while (j >= 0 && out.charAt(j) != '\'') j -= 1
              declineIf(j < 0, "unbalanced string in receiver")
            case '(' => depth -= 1
            case ')' => depth += 1
            case _ =>
          }
          j -= 1
        }
        declineIf(depth != 0, "unbalanced parens")
        // A function name may precede the group; consume it if present.
        if (j >= 0 && (out.charAt(j).isLetterOrDigit || out.charAt(j) == '_'))
          while (j >= 0 && (out.charAt(j).isLetterOrDigit ||
            out.charAt(j) == '_' || out.charAt(j) == '$')) j -= 1
      } else throw Decline(s"receiver boundary at '$c'")
      // Chain through a dot to the next segment; otherwise stop.
      if (j >= 0 && out.charAt(j) == '.') j -= 1 else expectMore = false
    }
    val start = j + 1
    declineIf(start >= end, "empty receiver")
    start
  }
}
