package graft.sql

import org.apache.spark.sql.SparkSession

/** Session-scoped ENUM type registry (round 18) — DuckDB's
  * `CREATE TYPE name AS ENUM ('a', 'b', ...)`.
  *
  * Spark has no user-defined SQL types, so enums are MODELED as their
  * VARCHAR form (exactly what `CAST(e AS VARCHAR)` yields in DuckDB)
  * with membership VALIDATION inlined at plan time: a cast to a
  * registered enum rewrites onto `graft_enum('name', expr)`, whose
  * builder reads this registry ON THE DRIVER and emits a CASE over an
  * inlined value array — executors never need the registry, and an
  * out-of-range value raises DuckDB's conversion-error shape.
  * `enum_range(NULL::name)` folds to the value list at rewrite time.
  * Ordering divergence (documented): DuckDB compares enums by member
  * INDEX; the VARCHAR model compares lexicographically.
  */
/** Single-evaluation extractor: DROP TYPE's registry removal is a side
  * effect — the rewrite must run exactly once per statement (the
  * TempTableRewritten pattern).
  */
object EnumDdlRewritten {
  def unapply(sql: String): Option[String] =
    if ("(?is)\\A\\s*(CREATE|DROP)\\s+TYPE\\b".r.findFirstIn(sql).isDefined)
      EnumTypes.ddlRewrite(sql)
    else None
}

object EnumTypes {

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[String]]()

  private def key(name: String): (SparkSession, String) =
    (SparkSession.active, name.toLowerCase)

  def define(name: String, values: Seq[String]): Unit = {
    registry.put(key(name), values)
    ()
  }

  def get(name: String): Option[Seq[String]] =
    try Option(registry.get(key(name)))
    catch { case scala.util.control.NonFatal(_) => None }

  def drop(name: String): Boolean = registry.remove(key(name)) != null

  private val createTypeRe =
    ("""(?is)\A\s*CREATE\s+TYPE\s+([A-Za-z_]\w*)\s+AS\s+ENUM\s*""" +
      """\((.+)\)\s*;?\s*\z""").r
  private val dropTypeRe =
    """(?is)\A\s*DROP\s+TYPE\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*\z""".r
  private val litRe = """\A'((?:[^']|'')*)'\z""".r

  /** CREATE TYPE / DROP TYPE — side-effecting pre-delegation rewrites
    * (Spark rejects both at parse, so no native statement is claimed);
    * the marker select returns DuckDB's empty result.
    */
  def ddlRewrite(sql: String): Option[String] = sql match {
    case createTypeRe(name, body) =>
      val vals = ReplaceRewrite.splitTop(body).map(_.trim).map {
        case litRe(v) => v.replace("''", "'")
        case other => return None // non-literal member: decline
      }
      if (vals.isEmpty) return None
      define(name, vals.toSeq)
      Some("SELECT CAST(NULL AS BIGINT) AS Count WHERE 1 = 0")
    case dropTypeRe(ifExists, name) =>
      if (!drop(name) && ifExists == null)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION", Map("errorMessage" ->
            s"Type with name $name does not exist!"))
      Some("SELECT CAST(NULL AS BIGINT) AS Count WHERE 1 = 0")
    case _ => None
  }

  /** Cast-position claims for registered enum names, run in the hint
    * chain (UNSUPPORTED_DATATYPE is a parse rejection):
    * `enum_range(NULL::name)` folds to the value-list literal;
    * `x::name` / CAST(x AS name) wrap the operand in graft_enum.
    *
    * Definition-order contexts first (round 19, verdict-18 #5): DuckDB
    * compares enums by member INDEX, so before the value claims run,
    * (a) an ORDER BY sort key that IS an enum cast and (b) a binary
    * comparison with an enum cast on either side are wrapped in
    * graft_enum_ord('name', x) — an inlined value→index CASE — making
    * sorts and comparisons honor definition order while SELECT output
    * keeps the VARCHAR model. Untyped VARCHAR enum columns (no cast in
    * the statement) keep the documented lexicographic divergence: the
    * registry has no column-type tracking to know better.
    */
  def castRewrite(text: String): Option[String] = {
    var cur = ordRewrite(text).getOrElse(text)
    var changed = cur ne text
    var m = ReplaceRewrite.maskLiterals(cur)

    def arrayLit(vals: Seq[String]): String =
      "array(" + vals.map(v => s"'${v.replace("'", "''")}'").mkString(", ") + ")"

    // enum_range(NULL::name) — fold first, before the cast claim eats
    // the `::name`.
    val rangeRe =
      """(?i)\benum_range\s*\(\s*NULL\s*::\s*([A-Za-z_]\w*)\s*\)""".r
    var hit = rangeRe.findFirstMatchIn(m)
    while (hit.isDefined) {
      val h = hit.get
      get(h.group(1)) match {
        case Some(vals) =>
          cur = cur.substring(0, h.start) + arrayLit(vals) + cur.substring(h.end)
          m = ReplaceRewrite.maskLiterals(cur)
          changed = true
          hit = rangeRe.findFirstMatchIn(m)
        case None => hit = None
      }
    }

    // CAST(x AS name) / TRY_CAST — operand directly delimited.
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
          // Anchor on the AS keyword itself (a leading \s+ would match
          // from position 0 when the operand is a masked literal,
          // yielding an empty operand).
          val asRe = """(?i)\bAS\s+([A-Za-z_]\w*)\s*\z""".r
          asRe.findFirstMatchIn(innerM).foreach { am =>
            get(am.group(1)) match {
              case Some(_) =>
                val operand = inner.substring(0, am.start).trim
                val tryPrefix = h.group(1) != null
                val fn = if (tryPrefix) "graft_enum_try" else "graft_enum"
                cur = cur.substring(0, h.start) +
                  s"$fn('${am.group(1).toLowerCase}', $operand)" +
                  cur.substring(close)
                m = ReplaceRewrite.maskLiterals(cur)
                changed = true
                scan = true
              case None =>
            }
          }
        }
      }
    }

    // x::name — postfix cast; the operand is the tightest primary to
    // the left (ListOpRewrite's scan discipline).
    val colonRe = """::\s*([A-Za-z_]\w*)""".r
    var again = true
    while (again) {
      again = false
      for (h <- colonRe.findAllMatchIn(m) if !again
           if m.charAt(h.start) == ':') {
        get(h.group(1)) match {
          case Some(_) =>
            ListOpRewrite.scanLeftPub(cur, m, h.start - 1) match {
              case Some(ls) =>
                val operand = cur.substring(ls, h.start).trim
                if (operand.nonEmpty) {
                  cur = cur.substring(0, ls) +
                    s"graft_enum('${h.group(1).toLowerCase}', $operand)" +
                    cur.substring(h.end)
                  m = ReplaceRewrite.maskLiterals(cur)
                  changed = true
                  again = true
                }
              case None =>
            }
          case None =>
        }
      }
    }

    if (changed) Some(cur) else None
  }

  /** Definition-order contexts (round 19): wrap enum casts in ORDER BY
    * keys and in `<`/`<=`/`>`/`>=` comparisons with
    * `graft_enum_ord('name', x)` — the inlined value→index CASE — so
    * ordering honors the declaration order like the host. Equality and
    * inequality are value-symmetric under the VARCHAR model and stay
    * untouched; BETWEEN and untyped VARCHAR columns remain the
    * documented divergence.
    */
  private[sql] def ordRewrite(text: String): Option[String] = {
    if (registry.isEmpty) return None
    var cur = text
    var changed = true
    var any = false
    val cmpOps = Seq("<=", ">=", "<", ">")
    // One wrapped cast per pass; rescan (extents shift).
    while (changed) {
      changed = false
      val m = ReplaceRewrite.maskLiterals(cur)
      val spans = DuckNullOrder.keySpans(m)
      // Enum casts present in the text: (start, end, name, operand).
      val casts = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, String, String)]
      for (h <- """::\s*([A-Za-z_]\w*)""".r.findAllMatchIn(m)
           if get(h.group(1)).isDefined)
        ListOpRewrite.scanLeftPub(cur, m, h.start - 1).foreach { ls =>
          val op = cur.substring(ls, h.start).trim
          if (op.nonEmpty) casts += ((ls, h.end, h.group(1), op))
        }
      for (h <- """(?i)\b(TRY_)?CAST\s*\(""".r.findAllMatchIn(m)) {
        val open = m.indexOf('(', h.start)
        val close = ReplaceRewrite.closeOf(cur, open)
        if (close > 0) {
          val innerM = m.substring(open + 1, close - 1)
          """(?i)\bAS\s+([A-Za-z_]\w*)\s*\z""".r.findFirstMatchIn(innerM)
            .filter(am => get(am.group(1)).isDefined)
            .foreach { am =>
              val operand =
                cur.substring(open + 1, open + 1 + am.start).trim
              casts += ((h.start, close, am.group(1), operand))
            }
        }
      }
      def wrap(name: String, inner: String): String =
        s"graft_enum_ord('${name.toLowerCase}', $inner)"
      // Raw-text whitespace skip: a masked literal is all spaces in m,
      // so skipping on the mask would leap over a literal operand.
      def nextNonSpace(i0: Int): Int = {
        var i = i0; while (i < m.length && cur.charAt(i).isWhitespace) i += 1; i
      }
      // Already wrapped? The cast start sits right after "graft_enum_ord('name', ".
      def alreadyWrapped(s: Int): Boolean = {
        val before = cur.substring(0, s)
        before.replaceAll("\\s+", " ").endsWith(", ") &&
          "(?i)graft_enum_ord\\s*\\(\\s*'[A-Za-z_]\\w*'\\s*,\\s*\\z".r
            .findFirstIn(before).isDefined
      }
      val it = casts.iterator
      while (it.hasNext && !changed) {
        val (s, e, name, operand) = it.next()
        if (!alreadyWrapped(s)) {
          // (a) the cast IS an ORDER BY key (trailing direction words ok).
          val asKey = spans.exists { case (ks, ke) =>
            ks == s && e <= ke && {
              val tail = m.substring(e, ke).trim
              tail.isEmpty ||
                tail.matches("(?i)(ASC|DESC)?\\s*(NULLS\\s+(FIRST|LAST))?\\s*")
            }
          }
          // (b) comparison operator directly right of the cast, with
          // another cast of the SAME enum on the other side — the host
          // compares enum-vs-enum by index but enum-vs-bare-VARCHAR
          // lexicographically (probed), and the VARCHAR model already
          // matches the latter natively, so only cast-op-cast wraps.
          val r0 = nextNonSpace(e)
          val opRight = cmpOps.find(o =>
            m.regionMatches(r0, o, 0, o.length) &&
              !(o == "<" && r0 + 1 < m.length &&
                (m.charAt(r0 + 1) == '>' || m.charAt(r0 + 1) == '=')) &&
              !(o == ">" && r0 + 1 < m.length && m.charAt(r0 + 1) == '='))
          val rhsCast = opRight.flatMap { op =>
            val rs = nextNonSpace(r0 + op.length)
            casts.find { case (s2, _, n2, _) =>
              s2 == rs && n2.equalsIgnoreCase(name) }
              .map(c => (op, c))
          }
          if (asKey) {
            cur = cur.substring(0, s) + wrap(name, cur.substring(s, e)) +
              cur.substring(e)
            changed = true; any = true
          } else rhsCast match {
            case Some((op, (s2, e2, _, _))) =>
              cur = cur.substring(0, s) +
                wrap(name, cur.substring(s, e)) + s" $op " +
                wrap(name, cur.substring(s2, e2)) + cur.substring(e2)
              changed = true; any = true
            case None =>
          }
        }
      }
    }
    if (any) Some(cur) else None
  }
}
