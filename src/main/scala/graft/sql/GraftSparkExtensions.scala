package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.highs.HighsFunctions

/** SQL parity layer (SURVEY.md §7 M3): registers the reference's two scalar
  * functions and four table functions into the Spark SQL catalog, so
  * `spark.sql("SELECT * FROM highs_solve('m')")` works exactly like the
  * DuckDB extension surface (highs_extension.cpp:725-776).
  *
  * Usage: `.config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftSparkExtensions)`.
  *
  * Eagerness contract: `spark.sql(...)` analyzes its plan eagerly, and the
  * TVF builder below runs at analysis — so each statement mutates the model
  * registry exactly when the statement is issued, preserving the
  * reference's statement-at-a-time semantics (SURVEY.md §3 E2) inside
  * Spark's otherwise-lazy evaluation.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftSparkExtensions.versionFn)
    ext.injectFunction(GraftSparkExtensions.opensslVersionFn)
    ext.injectFunction(GraftSparkExtensions.vectorCosineFn)
    ext.injectFunction(GraftSparkExtensions.vectorNormFn)
    GraftSparkExtensions.tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftSparkExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, name)

  /** Codegen-friendly scalar bridge: a StaticInvoke of the engine's
    * version-string methods (beats a ScalaUDF — no serialization, inlined
    * into whole-stage codegen). Targets the mirror class, whose static
    * forwarders delegate to the HighsFunctions object.
    */
  private def scalarFn(name: String, method: String)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name), (args: Seq[Expression]) =>
      StaticInvoke(
        Class.forName("graft.highs.HighsFunctions"),
        StringType,
        method,
        args,
        inputTypes = Seq(StringType)))

  val versionFn = scalarFn("highs_version", "versionStringUtf8")
  val opensslVersionFn = scalarFn("highs_openssl_version", "opensslVersionStringUtf8")

  /** Embedding math as native codegen'd expressions (graft.functions). */
  val vectorCosineFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vector_cosine"), info("vector_cosine"),
      (args: Seq[Expression]) => graft.functions.CosineSimilarity(args(0), args(1)))
  val vectorNormFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vector_norm"), info("vector_norm"),
      (args: Seq[Expression]) => graft.functions.VectorNorm(args(0)))

  private def asString(v: Any): String = v match {
    case s: UTF8String => s.toString
    case s: String => s
    case other => String.valueOf(other)
  }

  private def asDouble(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case d: java.math.BigDecimal => d.doubleValue()
    case s: UTF8String => s.toString.toDouble
    case other => other.toString.toDouble
  }

  /** A table function whose arguments must be constant-foldable (the
    * reference's bind phase extracts constants the same way,
    * highs_extension.cpp:229-258). The side effect runs here, at analysis;
    * the result becomes a LocalRelation.
    */
  private def tvf(name: String, arity: Int, schema: StructType)(
      exec: IndexedSeq[Any] => Seq[org.apache.spark.sql.Row])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info(name), (args: Seq[Expression]) => {
      if (args.size != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity arguments, got ${args.size}")
      require(args.forall(_.foldable), s"$name arguments must be constants")
      val vals = args.map(_.eval(null)).toIndexedSeq
      LocalRelation.fromExternalRows(DataTypeUtils.toAttributes(schema), exec(vals))
    })

  import org.apache.spark.sql.Row

  private val createVariablesSchema = StructType.fromDDL(
    "variable_name STRING, variable_index STRING, status STRING")
  private val createConstraintsSchema = StructType.fromDDL(
    "constraint_name STRING, constraint_index STRING, status STRING")
  private val setCoefficientsSchema = StructType.fromDDL(
    "constraint_name STRING, variable_name STRING, coefficient DOUBLE, status STRING")

  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    tvf("highs_create_variables", 6, createVariablesSchema) { v =>
      HighsFunctions.createVariablesRows(asString(v(0)), asString(v(1)),
        asDouble(v(2)), asDouble(v(3)), asDouble(v(4)), asString(v(5)))
    },
    tvf("highs_create_constraints", 4, createConstraintsSchema) { v =>
      HighsFunctions.createConstraintsRows(asString(v(0)), asString(v(1)),
        asDouble(v(2)), asDouble(v(3)))
    },
    tvf("highs_set_coefficients", 4, setCoefficientsSchema) { v =>
      HighsFunctions.setCoefficientsRows(asString(v(0)), asString(v(1)),
        asString(v(2)), asDouble(v(3)))
    },
    tvf("highs_solve", 1, HighsFunctions.solveSchema) { v =>
      HighsFunctions.solveRows(asString(v(0)))
    }
  )
}
