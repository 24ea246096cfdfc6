package graft.operators

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}

/** Spark-NATIVE regexp_replace (replace ALL matches) as a Column.
  *
  * The SQL name `regexp_replace` carries DuckDB's semantics since round
  * 19 (FIRST match only without the 'g' option —
  * [[graft.functions.ScalarCompat.duckRegexpReplace]]), and Spark 4's
  * Column API resolves `functions.regexp_replace` BY NAME through the
  * session FunctionRegistry, so it lands on that override too. Internal
  * Column-API code that wants Spark's replace-all (text normalization,
  * PII redaction, the profiler corpora) routes here instead: a direct
  * [[RegExpReplace]] construction that never touches the registry.
  */
object SparkCols {
  def regexpReplaceAll(c: Column, pattern: String, replacement: String): Column =
    GraftColumnBridge.column(RegExpReplace(GraftColumnBridge.expression(c),
      Literal(pattern), Literal(replacement)))
}
