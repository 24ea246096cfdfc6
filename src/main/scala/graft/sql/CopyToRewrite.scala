package graft.sql

/** Mechanical rewrite of DuckDB's `COPY ... TO` statement (the standard
  * export idiom of every DuckDB script; host capability pin
  * /root/reference/.github/workflows/MainDistributionPipeline.yml:29)
  * onto the eager `copy_to()` table function:
  *
  * {{{
  * COPY (SELECT ...) TO 'out.parquet' (FORMAT PARQUET)
  * COPY tablename    TO 'out.csv'     (FORMAT CSV, HEADER)
  * COPY tablename    TO 'out.parquet'          -- format from extension
  * COPY tablename    TO 'dir' (FORMAT PARQUET, PARTITION_BY (a, b))
  * }}}
  *
  * becomes `SELECT * FROM copy_to('<source>', '<path>', '<format>',
  * <header>[, '<partition_csv>'])`, which writes at analysis and
  * returns DuckDB's one-row `Count` result. Format defaults from the
  * path extension (`.parquet`/`.csv`) exactly as DuckDB infers it;
  * `HEADER` defaults true for CSV (DuckDB ≥0.8 default);
  * `PARTITION_BY` produces the SAME hive-style `col=value/` directory
  * layout on both engines (Spark: `DataFrameWriter.partitionBy` — the
  * 100 TB export layout, partition-prunable on re-read).
  *
  * The IMPORT direction (`COPY tbl FROM 'path' [(FORMAT ..., HEADER)]`)
  * rewrites onto `copy_from()`, which appends the file's rows into the
  * existing catalog table (Spark: `insertInto` — by-position, DuckDB's
  * own mapping) and returns the same one-row Count. CSV options
  * DELIMITER/QUOTE/ESCAPE/NULL map 1:1 onto the DataFrame reader/writer
  * (sep/quote/escape/nullValue); COMPRESSION onto the writer codec.
  * Anything else — other formats, unknown options, a non-literal
  * path — declines to the caller's guidance hint.
  */
object CopyToRewrite {

  def rewrite(sql: String): Option[String] = {
    val head = """(?is)\A\s*COPY\s+""".r.findFirstMatchIn(sql).getOrElse(return None)
    val i0 = head.end
    if (i0 >= sql.length) return None
    // Source: a parenthesized query (balanced — the select may itself
    // contain parens/strings) or a bare table identifier. The parens
    // are KEPT on the query form: copy_to's source dispatch routes
    // '('-prefixed text through spark.sql, and a parenthesized query
    // parses there whatever it starts with — stripping them broke
    // `COPY (WITH q AS ... SELECT ...)`, which begins with neither
    // SELECT nor '(' once unwrapped.
    val (source, afterSrc) =
      if (sql.charAt(i0) == '(') {
        val close = ReplaceRewrite.closeOf(sql, i0)
        if (close < 0) return None
        (sql.substring(i0, close).trim, close)
      } else {
        val idM = """\A([A-Za-z_][\w.]*)""".r
          .findFirstMatchIn(sql.substring(i0)).getOrElse(return None)
        (idM.group(1), i0 + idM.end)
      }
    if (source.isEmpty) return None
    val toM0 = """(?is)\A\s*(TO|FROM)\s+'((?:[^']|'')*)'""".r
      .findFirstMatchIn(sql.substring(afterSrc)).getOrElse(return None)
    val isImport = toM0.group(1).equalsIgnoreCase("FROM")
    // The import direction (`COPY tbl FROM 'path'`) appends the file's
    // rows into an EXISTING catalog table — only a bare table name can
    // be a target, never a query.
    if (isImport && source.startsWith("(")) return None
    val toM = toM0
    val path = toM.group(2).replace("''", "'")
    if (path.isEmpty) return None
    val tail = sql.substring(afterSrc + toM.end).trim
      .stripSuffix(";").trim

    var format: Option[String] = None
    var header: Option[Boolean] = None
    var partition: Seq[String] = Seq.empty
    var delimiter: Option[String] = None
    var compression: Option[String] = None
    var quote: Option[String] = None
    var escape: Option[String] = None
    var nullStr: Option[String] = None
    if (tail.nonEmpty) {
      if (!(tail.startsWith("(") && tail.endsWith(")"))) return None
      val fm = """(?i)\AFORMAT\s+(\w+)\z""".r
      val hm = """(?i)\AHEADER(?:\s+(TRUE|FALSE|1|0))?\z""".r
      val pm = """(?is)\APARTITION_BY\s*(?:\(\s*([^()]*?)\s*\)|([A-Za-z_]\w*))\z""".r
      val dm = """(?i)\A(?:DELIMITER|DELIM|SEP)\s+'((?:[^']|'')+)'\z""".r
      val cm = """(?i)\ACOMPRESSION\s+'?(\w+)'?\z""".r
      // QUOTE/ESCAPE accept '' (disable quoting / default doubling);
      // NULL[STR] is the written/read null marker (DataFrame option
      // nullValue). All three are CSV-only, both directions.
      val qm = """(?i)\AQUOTE\s+'((?:[^']|'')*)'\z""".r
      val em = """(?i)\AESCAPE\s+'((?:[^']|'')*)'\z""".r
      val nm = """(?i)\ANULL(?:STR)?\s+'((?:[^']|'')*)'\z""".r
      // splitTop, not split(","): PARTITION_BY (a, b) carries commas
      // inside its own parens.
      for (o <- ReplaceRewrite.splitTop(tail.substring(1, tail.length - 1))
             .map(_.trim) if o.nonEmpty) {
        o match {
          case fm(f) => format = Some(f.toLowerCase)
          case hm(v) => header = Some(v == null ||
            v.equalsIgnoreCase("true") || v == "1")
          case pm(list, single) if !isImport =>
            val names = Option(list)
              .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq(single))
            if (names.isEmpty || names.exists(!_.matches("[A-Za-z_]\\w*")))
              return None
            partition = names
          case dm(d) => delimiter = Some(d.replace("''", "'"))
          // COMPRESSION on the export side maps straight to the writer
          // codec (zstd/gzip/snappy/none — same names both engines);
          // readers sniff compression themselves, so accept-and-ignore
          // on import would hide a typo — decline there instead.
          case cm(c) if !isImport => compression = Some(c.toLowerCase)
          case qm(q) => quote = Some(q.replace("''", "'"))
          case em(e) => escape = Some(e.replace("''", "'"))
          case nm(x) => nullStr = Some(x.replace("''", "'"))
          case _ => return None
        }
      }
    }
    val fmt = format.orElse {
      val lower = path.toLowerCase
      if (lower.endsWith(".parquet")) Some("parquet")
      else if (lower.endsWith(".csv")) Some("csv")
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl") ||
        lower.endsWith(".ndjson")) Some("json")
      else None
    }.getOrElse(return None)
    if (fmt != "parquet" && fmt != "csv" && fmt != "json") return None

    // DELIMITER/QUOTE/ESCAPE/NULL are CSV notions on both engines.
    if ((delimiter.isDefined || quote.isDefined || escape.isDefined ||
      nullStr.isDefined) && fmt != "csv") return None
    // Quote-doubling only (DuckLiterals entry doubling rides along).
    def lit(s: String) =
      "'" + s.replace("'", "''") + "'"
    // Extra writer/reader options ride as one 'k=v;k=v' argument so the
    // TVF arities stay stable ('=' / ';' cannot appear in the values:
    // codec names are words and any option value containing them
    // declines; empty values — QUOTE '' — are legal).
    val kvs = delimiter.map(d => "delimiter" -> d).toSeq ++
      compression.map(c => "compression" -> c) ++
      quote.map(q => "quote" -> q) ++
      escape.map(e => "escape" -> e) ++
      nullStr.map(x => "nullstr" -> x)
    if (kvs.exists { case (_, x) => x.contains("=") || x.contains(";") })
      return None
    val opts = kvs.map { case (k, x) => s"$k=$x" }.mkString(";")
    val optsArg = if (opts.isEmpty) "" else s", ${lit(opts)}"
    if (isImport)
      return Some(s"SELECT * FROM copy_from(${lit(source)}, ${lit(path)}, " +
        s"${lit(fmt)}, ${header.getOrElse(true)}$optsArg)")
    val partArg =
      if (partition.isEmpty && opts.nonEmpty) s", ''"
      else if (partition.isEmpty) ""
      else s", ${lit(partition.mkString(","))}"
    Some(s"SELECT * FROM copy_to(${lit(source)}, ${lit(path)}, " +
      s"${lit(fmt)}, ${header.getOrElse(true)}$partArg$optsArg)")
  }
}
