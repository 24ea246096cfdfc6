package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression,
  NamedExpression, RowFrame, SpecifiedWindowFrame, UnboundedFollowing,
  UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  CollectSet, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{BitstringAgg, BitstringFromSet}

/** Grouped 1-arg `bitstring_agg(x)` with DuckDB's statistics-derived
  * range (round 19, ADVICE-18 medium #1).
  *
  * DuckDB's 1-arg form takes [min, max] from COLUMN-WIDE statistics, so
  * under GROUP BY every group shares one range and one string length.
  * A per-group observed range (what the bare aggregate would compute)
  * silently yields different-length, shifted strings for groups that
  * lack the global extremes. This rule rewrites
  *
  *   Aggregate(g, [..., bitstring_agg(x) AS b, ...], child)
  *
  * into
  *
  *   Project(..., bitstring_from_set(__set, min() over (), max() over ()) AS b, ...)
  *     Window(min(__mn) / max(__mx) OVER ())        -- over #groups rows
  *       Aggregate(g, [..., collect_set(x), min(x), max(x), ...], child)
  *
  * The global pass is a window over the ALREADY-AGGREGATED rows —
  * cardinality = #groups, so the single-partition window is cheap at
  * any input scale; the per-group state (distinct set) is exactly what
  * the aggregate buffer held before. Ungrouped 1-arg calls are
  * untouched (the group IS the column there), as are 3-arg calls.
  * Mixed shapes (the aggregate nested inside a larger expression at
  * the top level) decline with a targeted error rather than running
  * with silently divergent ranges.
  */
object BitstringGlobalRange extends Rule[LogicalPlan] {

  private def isBare(e: Expression): Boolean = e match {
    case AggregateExpression(BitstringAgg(_, None, None, _, _), _, _, _, _) => true
    case _ => false
  }

  private def containsBare(e: Expression): Boolean = e.exists(isBare)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.groupingExpressions.nonEmpty &&
        agg.aggregateExpressions.exists(containsBare) => rewrite(agg)
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    // (original alias, set/min/max inner aliases) per decomposed agg.
    val parts = scala.collection.mutable.ArrayBuffer
      .empty[(Alias, Alias, Alias, Alias)]
    val shaped: Seq[Either[Alias, NamedExpression]] =
      agg.aggregateExpressions.map {
        case a @ Alias(AggregateExpression(
            b @ BitstringAgg(c, None, None, _, _), _, _, filter, _), _) =>
          val i = parts.size
          val setA = Alias(AggregateExpression(
            CollectSet(c), Complete, isDistinct = false, filter),
            s"__bsa_set_$i")()
          val mnA = Alias(AggregateExpression(
            Min(c), Complete, isDistinct = false, filter), s"__bsa_mn_$i")()
          val mxA = Alias(AggregateExpression(
            Max(c), Complete, isDistinct = false, filter), s"__bsa_mx_$i")()
          parts += ((a, setA, mnA, mxA))
          Left(a)
        case ne if containsBare(ne) =>
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION",
            Map("errorMessage" -> ("bitstring_agg without explicit bounds " +
              "under GROUP BY is supported only as a top-level aggregate; " +
              "pass explicit min and max bounds")))
        case ne => Right(ne)
      }

    val inner = agg.copy(aggregateExpressions =
      shaped.collect { case Right(ne) => ne } ++
        parts.flatMap { case (_, s, mn, mx) => Seq(s, mn, mx) })

    val entire = WindowSpecDefinition(Nil, Nil,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))
    val winAliases = parts.map { case (_, _, mn, mx) =>
      val glo = Alias(WindowExpression(AggregateExpression(
        Min(mn.toAttribute), Complete, isDistinct = false, None), entire),
        mn.name.replace("_mn_", "_glo_"))()
      val ghi = Alias(WindowExpression(AggregateExpression(
        Max(mx.toAttribute), Complete, isDistinct = false, None), entire),
        mx.name.replace("_mx_", "_ghi_"))()
      (glo, ghi)
    }
    val win = Window(winAliases.toSeq.flatMap { case (a, b) => Seq(a, b) },
      Nil, Nil, inner)

    var k = -1
    val projectList: Seq[NamedExpression] = shaped.map {
      case Right(ne) => ne.toAttribute
      case Left(orig) =>
        k += 1
        val (_, setA, _, _) = parts(k)
        val (glo, ghi) = winAliases(k)
        Alias(BitstringFromSet(
          setA.toAttribute, glo.toAttribute, ghi.toAttribute),
          orig.name)(exprId = orig.exprId, qualifier = orig.qualifier,
          explicitMetadata = Some(orig.metadata))
    }
    Project(projectList, win)
  }
}
