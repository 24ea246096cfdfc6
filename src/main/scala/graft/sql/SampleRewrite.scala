package graft.sql

/** Mechanical rewrite of DuckDB's `USING SAMPLE` clause (friendly SQL —
  * DuckDB docs "Samples"; host pin v1.3.2,
  * MainDistributionPipeline.yml:29) onto Spark's native `TABLESAMPLE`:
  *
  * {{{
  * SELECT * FROM t USING SAMPLE 10%
  * SELECT * FROM t USING SAMPLE 10 PERCENT (bernoulli)
  * SELECT * FROM t USING SAMPLE 50 ROWS
  * SELECT * FROM t USING SAMPLE reservoir(20%)
  * SELECT * FROM t USING SAMPLE 10% (system, 42)
  * -- become --
  * SELECT * FROM t TABLESAMPLE (10 PERCENT) [REPEATABLE (42)]
  * SELECT * FROM t TABLESAMPLE (50 ROWS)
  * }}}
  *
  * Both clauses sit in the same syntactic slot (after a table reference
  * / at the end of a query block), so the rewrite is a pure in-place
  * text substitution — everything around it rides along, and the clause
  * rewrites at any nesting depth (the chain re-parses, so a second
  * clause in another block gets picked up on the next pass). The scan
  * never fires on valid statements — the chain only runs on parse
  * failure — and `JOIN ... USING (cols)` can't match (the '(' breaks
  * the `USING SAMPLE` adjacency).
  *
  * Semantics note, documented divergence: DuckDB's `system` sampling is
  * vector-granular and `reservoir` is its row-count default; Spark's
  * PERCENT sampling is Bernoulli row-level and ROWS is a deterministic
  * prefix limit. Row COUNTS agree (exactly for ROWS, in expectation for
  * PERCENT) but the specific rows drawn never hash-compare across
  * engines anyway — sampling methods are approximation knobs, not result
  * contracts, and at 100 TB the Bernoulli row-level form is the one that
  * parallelizes without coordinating. A `(method[, seed])` group maps:
  * the method name is accepted and dropped, the seed becomes
  * `REPEATABLE (seed)`.
  */
object SampleRewrite {

  private val clauseRe =
    ("""(?is)\bUSING\s+SAMPLE\s+(?:""" +
      """([A-Za-z_]\w*)\s*\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?\s*\)""" +
      """|(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?)""" +
      """(?:\s*\(\s*([A-Za-z_]\w*)?\s*,?\s*(\d+)?\s*\))?""" +
      """(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?""").r

  /** DuckDB also spells the method inside TABLESAMPLE itself —
    * `TABLESAMPLE bernoulli(10%)`, `TABLESAMPLE reservoir(50 ROWS)` —
    * which Spark's grammar (parenthesized spec only) rejects. Same
    * method-dropping mapping as the USING SAMPLE forms (round 20).
    */
  private val tablesampleMethodRe =
    ("""(?is)\bTABLESAMPLE\s+([A-Za-z_]\w*)\s*""" +
      """\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?\s*\)""" +
      """(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?""").r

  def rewriteTablesampleMethod(sql: String): Option[String] = {
    val m = tablesampleMethodRe.findFirstMatchIn(sql).getOrElse(return None)
    val number = m.group(2)
    val unit = Option(m.group(3)).map(_.trim.toUpperCase).getOrElse("")
    val spec = unit match {
      case "%" | "PERCENT" => s"$number PERCENT"
      case _ if number.contains(".") => return None
      case _ => s"$number ROWS"
    }
    val rep = Option(m.group(4)).map(s => s" REPEATABLE ($s)").getOrElse("")
    Some(sql.substring(0, m.start) + s"TABLESAMPLE ($spec)$rep" +
      sql.substring(m.end))
  }

  def rewrite(sql: String): Option[String] = {
    val m = clauseRe.findFirstMatchIn(sql).getOrElse(return None)
    val number = Option(m.group(2)).getOrElse(m.group(4))
    val unit = Option(m.group(3)).orElse(Option(m.group(5)))
      .map(_.trim.toUpperCase).getOrElse("")
    val seed = Option(m.group(8)).orElse(Option(m.group(7)))
    val spec = unit match {
      case "%" | "PERCENT" => s"$number PERCENT"
      // A bare or ROWS count must be integral (Spark's ROWS form — a
      // deterministic prefix limit, like DuckDB's reservoir count).
      case _ if number.contains(".") => return None
      case _ => s"$number ROWS"
    }
    val rep = seed.map(s => s" REPEATABLE ($s)").getOrElse("")
    Some(sql.substring(0, m.start) + s"TABLESAMPLE ($spec)$rep" +
      sql.substring(m.end))
  }
}
