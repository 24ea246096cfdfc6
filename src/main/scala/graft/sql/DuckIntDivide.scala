package graft.sql

import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Retarget every parsed `div` onto DuckDB's `//` semantics (round 20,
  * verdict-19 #5). The `//` operator reaches Spark as ` div ` (the
  * precedence-preserving textual rewrite in [[GraftSparkExtensions]]
  * intDivRewrite — `//` shares the multiplicative level with `*`/`/`,
  * exactly where Spark parses `div`), but Spark's IntegralDivide is
  * ANSI-loud on a zero divisor and integral-only, where the host
  * (probed v1.0.0) is NULL-on-zero, truncating on integrals, and plain
  * DOUBLE division on float/decimal args (7.5 // 2 → 3.75). Resolution
  * rule, not optimizer: IntegralDivide over DOUBLE children must be
  * replaced before CheckAnalysis rejects it.
  *
  * Applies to ALL `div` spellings, including ones typed natively — this
  * engine's contract is DuckDB parity, and `//` is the only way the
  * dialect surface emits the node. Replacement contains no
  * IntegralDivide, so the fixpoint terminates.
  */
object DuckIntDivide extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_ARITHMETIC)) {
      case p => p.transformExpressionsUpWithPruning(
        _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_ARITHMETIC)) {
        case d: IntegralDivide if d.left.resolved && d.right.resolved =>
          GraftSparkExtensions.duckDivideExpr(d.left, d.right)
      }
    }
}
