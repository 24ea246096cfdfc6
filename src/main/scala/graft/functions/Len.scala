package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `len(x)` — ONE name across strings (characters), lists
  * (elements), and blobs (bytes), returning BIGINT. Spark splits this
  * across `length` (strings/binary, INT) and `size` (arrays, INT) and
  * `length` REJECTS arrays, so pasted DuckDB like `len(string_split(t,
  * ' '))` has no direct spelling; this expression dispatches on the
  * child's resolved type at plan time (static — the branch is baked
  * into codegen, no per-row type test).
  */
case class Len(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType | ArrayType(_, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"len requires string, binary, or array, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case ArrayType(_, _) => v.asInstanceOf[ArrayData].numElements().toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = (long) $c.numChars();"
      case BinaryType => s"${ev.value} = (long) $c.length;"
      case ArrayType(_, _) => s"${ev.value} = (long) $c.numElements();"
    })

  override protected def withNewChildInternal(newChild: Expression): Len =
    copy(child = newChild)

  override def prettyName: String = "len"
}

/** UTF8String-typed static bridges for StaticInvoke call sites (Spark
  * hands StringType arguments to StaticInvoke as UTF8String — a JDK
  * method like Pattern.quote(String) can't be invoked directly).
  */
object StringCompat {
  def regexQuoteUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(java.util.regex.Pattern.quote(s.toString))
}
