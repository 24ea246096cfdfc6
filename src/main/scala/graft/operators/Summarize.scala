package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DuckDB-style `SUMMARIZE` (row per COLUMN, stats as columns — the shape
  * the reference's host prints; DuckDB 1.3 docs), computed as ONE Spark
  * aggregate job over the table: every column contributes its seven
  * aggregates to a single wide `agg`, so the input is scanned once however
  * many columns it has (`Dataset.summary()` has the transposed shape —
  * row per stat — and computes approximate quantiles besides; this is the
  * exact-stats complement whose integer/min/max fields an independent
  * engine reproduces bit-for-bit, which is what the declared-query oracle
  * hash-compares).
  *
  * Exposed to SQL as the `summarize('table')` TVF, and the literal DuckDB
  * statement `SUMMARIZE t` parses via the hint parser's rewrite
  * ([[graft.sql.GraftHintParser]]), so the pasted statement actually runs
  * instead of landing on a pointer.
  *
  * Columns: (column_name, column_type, min_val, max_val, approx_unique,
  * avg_val, std_val, n_nonnull, n_null). min/max are cast to string (one
  * schema across heterogeneous columns — DuckDB prints VARCHAR there too);
  * avg/std only for numeric columns; non-orderable types (map, …) get null
  * min/max/approx_unique but exact counts.
  */
object Summarize {

  val schema: StructType = StructType.fromDDL(
    "column_name STRING, column_type STRING, min_val STRING, max_val STRING, " +
      "approx_unique BIGINT, avg_val DOUBLE, std_val DOUBLE, " +
      "n_nonnull BIGINT, n_null BIGINT")

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
        TimestampType | TimestampNTZType | BinaryType |
        _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case ArrayType(et, _) => orderable(et)
    case st: StructType => st.fields.forall(f => orderable(f.dataType))
    case _ => false
  }

  /** The per-column stats rows, computed eagerly (one aggregate job). */
  def rows(df: DataFrame): Seq[Row] = {
    val fields = df.schema.fields.toSeq
    if (fields.isEmpty) return Seq.empty
    // Resolve columns POSITIONALLY (toDF renames by position): a join
    // result or view can carry duplicate column names, where a by-name
    // col("`x`") throws AMBIGUOUS_REFERENCE — DuckDB's SUMMARIZE profiles
    // such tables fine, so we must too. Reported names stay the originals.
    val positional = df.toDF(fields.indices.map(i => s"__graft_sum_c$i"): _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"__graft_sum_c$i")
      val isNum = f.dataType.isInstanceOf[NumericType]
      val ord = orderable(f.dataType)
      Seq(
        if (ord) min(c).cast("string") else nullS,
        if (ord) max(c).cast("string") else nullS,
        if (ord) approx_count_distinct(c).cast("long") else nullL,
        if (isNum) avg(c.cast("double")) else nullD,
        if (isNum) stddev_samp(c.cast("double")) else nullD,
        count(c).cast("long"),
        count(when(c.isNull, lit(1))).cast("long"))
    }
    val r = positional.agg(aggs.head, aggs.tail: _*).head()
    fields.zipWithIndex.map { case (f, i) =>
      val b = i * 7
      def opt[A](j: Int, get: Int => A): Any =
        if (r.isNullAt(b + j)) null else get(b + j)
      Row(f.name, f.dataType.sql,
        opt(0, r.getString), opt(1, r.getString), opt(2, r.getLong),
        opt(3, r.getDouble), opt(4, r.getDouble),
        r.getLong(b + 5), r.getLong(b + 6))
    }
  }
}
