package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, ConcatWs,
  DateDiff, Expression, FormatString, Length, Literal, Size, SubtractDates,
  Unevaluable}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  PercentileDisc}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Placeholder the registry's `concat` builder emits: the host-vs-Spark
  * choice (stringify-and-skip-NULLs vs native array concat) needs the
  * RESOLVED child types, which function builders never see. Replaced by
  * [[ConcatDialect]] within the resolution fixpoint; the placeholder
  * dataType is only ever observed in the same iteration that replaces
  * it.
  */
case class DuckConcatMarker(children: Seq[Expression]) extends Expression
    with Unevaluable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Resolution-time arm of the thirteenth sweep — shapes whose
  * replacement must land INSIDE the fixpoint so parents (explode over an
  * array concat, comparisons over day counts) keep resolving naturally.
  * Every replacement erases its own match, so the fixpoint terminates.
  */
object ConcatDialect extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // concat: all-array (one element type) → Spark's native array
        // concat, the form this repo's operators use; anything else →
        // the host's NULL-skipping stringify (concat('a', NULL, 'b') =
        // 'ab', concat(1, 2.5) = '12.5' — probed). Array arguments in a
        // MIXED list stringify like the host ('[1, 2]').
        case m: DuckConcatMarker if m.children.forall(_.resolved) =>
          val dts = m.children.map(_.dataType)
          // ALL arrays → native Concat even when element nullability or
          // struct-field metadata differ (Triangles concatenates
          // array<struct> with a transform() result whose containsNull
          // differs) — the same fixpoint's TypeCoercion unifies them.
          if (dts.forall(_.isInstanceOf[ArrayType]))
            Concat(m.children)
          else
            ConcatWs(Literal("") +: m.children.map(c =>
              if (c.dataType == StringType) c else Cast(c, StringType)))
        // any_value: the host SKIPS NULLs; Spark's default keeps them —
        // a silent wrong value on columns with NULL gaps. The parser
        // builds AnyValue directly (never consults the registry, so a
        // function override cannot catch it); RESPECT NULLS has no host
        // spelling, so every any_value becomes ignoreNulls here. The
        // guard erases the match.
        case av: org.apache.spark.sql.catalyst.expressions.aggregate.AnyValue
            if !av.ignoreNulls =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.AnyValue(
            av.child, true)
        // DATE - DATE: BIGINT days on the host; Spark's SubtractDates
        // is a day-time interval. TIMESTAMP arithmetic is untouched.
        case SubtractDates(l, r, _)
            if l.resolved && r.resolved &&
              l.dataType == DateType && r.dataType == DateType =>
          Cast(DateDiff(l, r), LongType)
        // length(list): element count (BIGINT) on the host; Spark's
        // Length is string/binary-only and would die in CheckAnalysis.
        case Length(c) if c.resolved && c.dataType.isInstanceOf[ArrayType] =>
          Cast(Size(c), LongType)
        // printf/format hand raw values to java.util.Formatter, which
        // rejects Decimal under %f — cast decimals to DOUBLE (the
        // host formats them as floats). The guard erases the match.
        case f: FormatString
            if f.children.tail.exists(e =>
              e.resolved && e.dataType.isInstanceOf[DecimalType]) =>
          FormatString((f.children.head +: f.children.tail.map {
            case e if e.resolved && e.dataType.isInstanceOf[DecimalType] =>
              Cast(e, DoubleType)
            case e => e
          }): _*)
      }
    }
}

/** Post-hoc arm (Once batch): quantile_disc/quantile pick an ELEMENT,
  * so the host returns the INPUT type (quantile_disc(int, 0.5) is
  * INTEGER — probed); Spark's PercentileDisc always returns DOUBLE.
  * Integral/decimal inputs cast back (lossless — the result is an
  * actual element). Once-batch placement because the wrap would
  * re-match its own child under a fixpoint.
  */
object SweepThirteenFixups extends Rule[LogicalPlan] {
  private def percentileTarget(pd: PercentileDisc): Option[DataType] = {
    val childDt = pd.child.dataType
    val want = childDt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    if (!want) None
    else pd.dataType match {
      case ArrayType(DoubleType, n) => Some(ArrayType(childDt, n))
      case DoubleType => Some(childDt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case ae @ AggregateExpression(pd: PercentileDisc, _, _, _, _)
            if pd.child.resolved =>
          percentileTarget(pd) match {
            case Some(t) => Cast(ae, t)
            case None => ae
          }
      }
    }
}
