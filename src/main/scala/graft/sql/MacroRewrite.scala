package graft.sql

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, PlanExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface

/** Tier-1 landing for DuckDB's `CREATE MACRO` (the reference host's
  * capability — DuckDB ≥1.3, MainDistributionPipeline.yml:29): the first
  * statement a pasted DuckDB setup script usually hits.
  *
  * {{{
  * CREATE [OR REPLACE] [TEMP[ORARY]] MACRO taxed(p, t) AS p * (1 + t)
  * }}}
  *
  * A textual rewrite to Spark 4's SQL UDF (`CREATE TEMPORARY FUNCTION …
  * RETURNS … RETURN …`) cannot be faithful, because Spark's syntax makes
  * parameter and return TYPES mandatory while DuckDB macros are untyped
  * expression templates bound lazily at each call site — any guessed type
  * silently changes semantics for the shapes it guesses wrong (a DOUBLE
  * default breaks string macros, and vice versa). So instead of rewriting
  * the text, this handler reproduces the semantics: it parses the body
  * once into an expression TEMPLATE (via the delegated Spark parser) and
  * registers a function builder in the session's function registry that,
  * at each call site, substitutes the caller's argument expressions for
  * the parameter names and lets the analyzer type the result in place —
  * exactly DuckDB's lazy binding (src/include bind path of duckdb macros),
  * Spark-native (the same `Seq[Expression] => Expression` builder channel
  * `SparkSessionExtensions.injectFunction` uses). Non-parameter
  * identifiers in the body stay unresolved and bind to the call site's
  * relation, and a macro calling another macro resolves through the same
  * registry at analysis — both DuckDB behaviors, for free.
  *
  * Scope mirrors the TEMP form (session-local registry, gone with the
  * session). Declined to the tier-2 hint: table macros (`AS TABLE …` —
  * that is a view, not a scalar), overload lists (`(a) AS …, (a,b) AS …`),
  * default parameters (`b := 1` — their call syntax doesn't parse on
  * Spark anyway), multipart names, and bodies Spark's expression parser
  * rejects. A plain CREATE over an existing name errors like DuckDB's
  * catalog would instead of silently replacing.
  *
  * The returned replacement text is a 1-row marker statement (the
  * registration side effect already happened — same eagerness contract as
  * the solver TVFs); DDL results are not part of any oracle comparison.
  */
object MacroRewrite {

  private val headRe =
    """(?is)\A\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?MACRO\s+([A-Za-z_]\w*)\s*\(""".r

  def rewrite(sql: String, delegate: ParserInterface): Option[String] = {
    val m = headRe.findFirstMatchIn(sql).getOrElse(return None)
    val orReplace = m.group(1) != null
    val name = m.group(2)
    // Multipart names (schema.macro) fall outside the supported shape.
    if (sql.take(m.start(2)).trim.endsWith(".")) return None

    // Parameter list: identifiers and commas only. Anything else —
    // `:=` defaults, types, nested parens — declines to the hint.
    var i = m.end // position just past '('
    val n = sql.length
    val params = Vector.newBuilder[String]
    val cur = new StringBuilder
    var wordDone = false // saw whitespace after an identifier in this slot
    var closed = -1
    while (i < n && closed < 0) {
      val c = sql.charAt(i)
      if (c == ')') {
        if (cur.nonEmpty) { params += cur.toString; cur.clear() }
        closed = i
      } else if (c == ',') {
        if (cur.isEmpty) return None
        params += cur.toString; cur.clear(); wordDone = false
      } else if (c.isWhitespace) {
        if (cur.nonEmpty) wordDone = true
      } else if (c.isLetterOrDigit || c == '_') {
        // A second word in one slot is a type or a default — decline.
        if (wordDone || (cur.isEmpty && c.isDigit)) return None
        cur.append(c)
      } else return None
      i += 1
    }
    if (closed < 0) return None
    val paramList = params.result()
    if (paramList.map(_.toLowerCase).distinct.size != paramList.size) return None

    // After the list: AS, then the body. A comma here is an overload
    // list; TABLE after AS is a table macro — both decline.
    val tail = sql.substring(closed + 1)
    val asRe = """(?is)\A\s*AS\b""".r
    val asM = asRe.findFirstMatchIn(tail).getOrElse(return None)
    val body0 = tail.substring(asM.end).trim.stripSuffix(";").trim
    if (body0.isEmpty) return None
    if ("""(?is)\ATABLE\b""".r.findFirstIn(body0).isDefined) return None
    if (",\\s*\\(".r.findFirstIn(body0).isDefined &&
      """(?is),\s*\([A-Za-z_,\s\w]*\)\s*AS\b""".r.findFirstIn(body0).isDefined)
      return None // overload list: `, (a, b) AS …`

    val template = try delegate.parseExpression(body0)
      catch { case NonFatal(_) => return None }

    // A body carrying a subquery (scalar/IN/EXISTS — any PlanExpression)
    // declines to the hint: parameter substitution via transformUp walks
    // the EXPRESSION tree only, not the nested plan, so a parameter named
    // inside the subquery would silently bind to a same-named call-site
    // column instead — wrong results, no error. Declining is the only
    // faithful option until substitution descends into plans.
    if (template.exists(_.isInstanceOf[PlanExpression[_]])) return None

    // A self-referential body (direct recursion) would register fine and
    // then die at every call site with the analyzer's opaque
    // max-iterations failure as the macro expands into itself forever.
    // DuckDB's binder rejects it at creation ("recursive macros are not
    // supported"); raise the same clean error at the same point.
    if (template.exists {
      case f: UnresolvedFunction =>
        f.nameParts.size == 1 && f.nameParts.head.equalsIgnoreCase(name)
      case _ => false
    }) throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION",
      Map("errorMessage" ->
        s"macro '$name' references itself — recursive macros are not supported"))

    val spark = try org.apache.spark.sql.SparkSession.active
      catch { case NonFatal(_) => return None }
    val registry = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier(name.toLowerCase)
    if (!orReplace && registry.functionExists(fid))
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"macro '$name' already exists — use CREATE OR REPLACE MACRO"))

    val lowered = paramList.map(_.toLowerCase)
    val builder: Seq[Expression] => Expression = { args =>
      if (args.size != lowered.size)
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" ->
            s"macro '$name' expects ${lowered.size} argument(s), got ${args.size}"))
      template.transformUp {
        case a: UnresolvedAttribute if a.nameParts.size == 1 &&
            lowered.contains(a.nameParts.head.toLowerCase) =>
          args(lowered.indexOf(a.nameParts.head.toLowerCase))
      }
    }
    registry.registerFunction(fid,
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, name), builder)
    Some(s"SELECT '$name' AS `macro`")
  }
}
