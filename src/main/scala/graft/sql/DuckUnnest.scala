package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** DuckDB's `unnest()` generator, tagged (round 20).
  *
  * Behaviorally identical to Spark's Explode (same ExplodeBase engine),
  * but its OWN node class so [[ParallelUnnestZip]] can recognize
  * genuine `unnest()` calls: DuckDB evaluates MULTIPLE unnests in one
  * select list in LOCKSTEP — `unnest([1,2,3]) u, unnest(['a','b']) v`
  * yields 3 rows (shorter lists pad NULL, host-probed v1.0.0) — where
  * Spark's multi-generator support chains Generates into a CROSS
  * product (9 rows: a silent wrong VALUE on pasted text). Tagging only
  * unnest leaves a native `explode()` pair's cross semantics untouched.
  */
case class DuckUnnest(child: Expression) extends ExplodeBase {
  override val position: Boolean = false
  override protected def withNewChildInternal(c: Expression): DuckUnnest =
    copy(child = c)
}

/** Fuse chains of unnest-Generates into ONE
  * `explode(arrays_zip(...))` + field projection — DuckDB's lockstep
  * semantics (arrays_zip pads the shorter array with NULL exactly like
  * the host). Post-hoc resolution: ExtractGenerator has already turned
  * the select list's generators into nested Generate nodes by then.
  * Chains the rule cannot fuse (an intervening node between two
  * DuckUnnest Generates) fail LOUDLY rather than keeping the silent
  * cross product.
  */
object ParallelUnnestZip extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val out = plan.resolveOperatorsDown {
      case g: Generate if g.generator.isInstanceOf[DuckUnnest] &&
          g.child.isInstanceOf[Generate] &&
          g.child.asInstanceOf[Generate].generator.isInstanceOf[DuckUnnest] =>
        fuse(g)
    }
    // Any remaining stacked DuckUnnest pair means the chain had a shape
    // the fuse above could not reach — refuse the cross product.
    var stacked = false
    out.foreach {
      case g: Generate if g.generator.isInstanceOf[DuckUnnest] =>
        g.child.foreach {
          case h: Generate if h.generator.isInstanceOf[DuckUnnest] =>
            stacked = true
          case _ =>
        }
      case _ =>
    }
    if (stacked)
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          ("multiple unnest() calls in one SELECT evaluate in LOCKSTEP " +
            "on the host (shorter lists pad NULL), and this statement's " +
            "shape could not be fused into that form — rewrite as " +
            "explode(arrays_zip(a, b)) to choose lockstep explicitly, " +
            "or use separate LATERAL VIEW explode() clauses for a " +
            "cross product.")))
    out
  }

  /** Collapse the Generate chain rooted at `top` (every node a
    * DuckUnnest Generate, verified by the caller for the first two).
    */
  private def fuse(top: Generate): LogicalPlan = {
    // Walk down: collect (arrayExpr, outputAttr) innermost-last.
    var gens = List.empty[(Expression, Attribute)]
    var cur: LogicalPlan = top
    while (cur.isInstanceOf[Generate] &&
        cur.asInstanceOf[Generate].generator.isInstanceOf[DuckUnnest] &&
        cur.asInstanceOf[Generate].unrequiredChildIndex.isEmpty) {
      val g = cur.asInstanceOf[Generate]
      gens ::= ((g.generator.asInstanceOf[DuckUnnest].child,
        g.generatorOutput.head))
      cur = g.child
    }
    val base = cur
    if (gens.size < 2) return top
    // Inner generators' array exprs may only reference the BASE child
    // (an expr referencing an outer unnest's output can't zip).
    val baseOut = base.outputSet
    if (!gens.forall(_._1.references.subsetOf(baseOut))) return top
    val zipped = ArraysZip(gens.map(_._1))
    val zAttr = AttributeReference("__graft_zip",
      zipped.dataType.asInstanceOf[ArrayType].elementType)()
    val gen = Generate(Explode(zipped), Nil, outer = false, None,
      Seq(zAttr), base)
    val fields = gens.zipWithIndex.map { case ((_, attr), i) =>
      Alias(GetStructField(zAttr, i), attr.name)(exprId = attr.exprId)
    }
    Project(base.output ++ fields, gen)
  }
}
