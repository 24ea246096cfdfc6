package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The as-of join — for each left row, the single most recent right row
  * whose order key is <= (or <, with `strict`) the left row's, per join
  * key: the standard event↔dimension-history alignment (DuckDB ships it
  * as `ASOF JOIN` SQL syntax; the reference inherits that via its DuckDB
  * ≥0.10 host — /root/reference/.github/workflows/
  * MainDistributionPipeline.yml:29).
  *
  * Scale shape — the LINEAR union+window formulation, not a join: an
  * equi-join on the key pair-inflates (every left row × every earlier
  * right row of its key) before a per-row argmax could prune, which is
  * quadratic for hot keys. Instead both sides are unioned into one
  * per-key timeline, sorted once, and the as-of payload is the running
  * `last` non-null right payload at each left row — exactly ONE hash
  * shuffle (the per-key window; plan-asserted in QueryPlanSpec), cost
  * O((|L|+|R|) log) regardless of key skew.
  */
object AsOfJoin {

  /** As-of join of `left` to `right` on equal `on`. Backward (the
    * default): match the most recent right row with `rightOrder` <=
    * `leftOrder` (`strict` = true for `<`). Forward (`forward` = true,
    * DuckDB's `l.ts <= r.ts` inequality direction): match the EARLIEST
    * right row with `rightOrder` >= `leftOrder` (`strict` for `>`) — the
    * mirror image, same single-shuffle union+window plan with the
    * window frame looking ahead instead of behind. Output: every left
    * column plus `payload` columns from the matched right row; `inner`
    * = true (the DuckDB `ASOF JOIN` default) drops unmatched left rows,
    * false keeps them with null payloads (`ASOF LEFT JOIN`).
    *
    * Both order columns must have the same (comparable) type. If several
    * right rows tie on the matched `rightOrder`, the one picked is
    * arbitrary (the same contract as DuckDB's ASOF JOIN); disambiguate by
    * pre-aggregating the right side to one row per (key, order).
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: String,
      leftOrder: String, rightOrder: String, payload: Seq[String],
      strict: Boolean = false, inner: Boolean = true,
      forward: Boolean = false): DataFrame =
    asofJoinMulti(left, right, Seq(on), leftOrder, rightOrder, payload,
      strict, inner, forward)

  /** Composite-key as-of: equality on EVERY `on` column (the
    * symbol+venue shape), same single-shuffle union+window plan — the
    * window partitions by a struct of the key columns, so the shuffle
    * count does not grow with the key arity.
    */
  def asofJoinMulti(left: DataFrame, right: DataFrame, on: Seq[String],
      leftOrder: String, rightOrder: String, payload: Seq[String],
      strict: Boolean = false, inner: Boolean = true,
      forward: Boolean = false): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.intersect(left.columns).isEmpty,
      s"payload columns ${payload.intersect(left.columns).mkString(",")} clash with left columns")
    // Kind orders rows at EQUAL instants. Backward: inclusive (<=) sorts
    // right rows before left ones, so a right row at exactly the left's
    // order key is visible to it; strict (<) sorts them after, so it is
    // not. Forward mirrors: the window looks ahead from the current row,
    // so inclusive (>=) needs the equal-instant right row AFTER the left
    // row, strict (>) before it (outside the frame).
    val rightKind =
      if (forward) { if (strict) 0 else 2 }
      else { if (strict) 2 else 0 }
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payStruct = struct(payload.map(col).toIndexedSeq: _*)
    val leftType = left.select(leftStruct.as("s")).schema("s").dataType
    val payType = right.select(payStruct.as("s")).schema("s").dataType
    // Single key: the bare column (alias-aware partitioning reuse, see
    // the output note below). Multi key: one struct of the key columns.
    def keyOf(df: DataFrame): org.apache.spark.sql.Column =
      if (on.size == 1) df(on.head)
      else struct(on.map(df(_)).toIndexedSeq: _*)
    val l = left.select(keyOf(left).as("__k"), col(leftOrder).as("__t"),
      lit(1).as("__kind"), leftStruct.as("__left"),
      lit(null).cast(payType).as("__pay"))
    val r = right.select(keyOf(right).as("__k"), col(rightOrder).as("__t"),
      lit(rightKind).as("__kind"), lit(null).cast(leftType).as("__left"),
      payStruct.as("__pay"))
    val w0 = Window.partitionBy("__k").orderBy(col("__t"), col("__kind"))
    val (w, pick) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__pay"), ignoreNulls = true))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__pay"), ignoreNulls = true))
    val matched = l.union(r)
      .withColumn("__asof", pick.over(w))
      .filter(col("__kind") === 1)
    // The key column comes back as an ALIAS of the window's partition
    // attribute (`__k`), not re-extracted from the left struct: alias-aware
    // output partitioning then lets a downstream groupBy/join on the key
    // reuse the window's hash exchange instead of shuffling again
    // (plan-asserted in QueryPlanSpec — the whole q29 pipeline runs on ONE
    // hash shuffle).
    val outCols = left.columns.map { c =>
      if (on.size == 1 && c == on.head) col("__k").as(c)
      else if (on.size > 1 && on.contains(c)) col(s"__k.$c").as(c)
      else col(s"__left.$c")
    }.toIndexedSeq
    (if (inner) matched.filter(col("__asof").isNotNull) else matched)
      .select(outCols :+ col("__asof.*"): _*)
  }
}
