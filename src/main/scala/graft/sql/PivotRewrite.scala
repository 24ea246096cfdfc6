package graft.sql

/** Mechanical rewrite of DuckDB's simplified `PIVOT` STATEMENT
  * (friendly SQL, DuckDB ≥0.8):
  *
  * {{{
  * PIVOT tbl ON col USING sum(v) [GROUP BY g1, g2]
  * -- becomes --
  * SELECT * FROM pivot_auto('tbl', 'col', 'sum(v)'[, 'g1, g2'])
  * }}}
  *
  * Spark's SQL PIVOT demands an explicit IN value list; DuckDB's
  * statement discovers the pivot columns from the data, which the
  * `pivot_auto` TVF reproduces through the Dataset API's dynamic
  * `groupBy().pivot(col)`. Scope is the common single-table form,
  * declined otherwise: a plain single-part table name, one ON column
  * (single-part identifier), one USING aggregate expression (no alias —
  * aliased pivots name their columns `value_alias` in DuckDB, a naming
  * scheme the plain expansion would not match), and an optional GROUP
  * BY of plain column names. `PIVOT ... IN (...)` (static value list)
  * maps directly onto Spark's native PIVOT and is left to the hint.
  */
object PivotRewrite {

  private val headRe =
    """(?is)\A\s*PIVOT\s+([A-Za-z_]\w*)\s+ON\s+([A-Za-z_]\w*)\s+USING\s+(.*?)(?:\s+GROUP\s+BY\s+(.*?))?\s*;?\s*\z""".r

  def rewrite(sql: String): Option[String] = {
    val m = headRe.findFirstMatchIn(sql).getOrElse(return None)
    val table = m.group(1)
    val onCol = m.group(2)
    val agg = m.group(3).trim
    val groups = Option(m.group(4)).map(_.trim).getOrElse("")
    if (agg.isEmpty) return None
    // An IN list, multiple USING aggregates, an aliased aggregate, or
    // nested quotes fall outside the supported shape. The alias test
    // looks at the aggregate's text with paren groups removed, so
    // CAST(x AS t) INSIDE the aggregate does not false-decline — only a
    // top-level `agg(...) AS name` alias does.
    if ("""(?i)\bIN\s*\(""".r.findFirstIn(sql).isDefined) return None
    if (ReplaceRewrite.splitTop(agg).size != 1) return None
    var aggOuter = agg
    while (aggOuter.contains("("))
      aggOuter = aggOuter.replaceAll("\\([^()]*\\)", "")
    if ("""(?i)\bAS\b""".r.findFirstIn(aggOuter).isDefined) return None
    if (agg.contains("'")) return None
    if (groups.nonEmpty &&
      !groups.split(",").forall(_.trim.matches("[A-Za-z_]\\w*"))) return None
    val groupArg = if (groups.isEmpty) "" else s", '$groups'"
    Some(s"SELECT * FROM pivot_auto('$table', '$onCol', '$agg'$groupArg)")
  }
}
