package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType,
  ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `bit_count(x)` across BOTH its domains: integers (set bits
  * of the two's-complement value — Spark's native bit_count) and BIT
  * strings (count of '1' characters; the engine models BIT as its
  * VARCHAR form, see [[ScalarCompat.bitFromString]]). Registering the
  * name would otherwise SHADOW Spark's integer form, so this
  * expression dispatches on the child's resolved type at plan time —
  * Len-style, the branch baked into codegen.
  */
case class BitCountCompat(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bit_count requires an integer or BIT string, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => BitCountCompat.ones(v.asInstanceOf[UTF8String])
    case ByteType => java.lang.Long.bitCount(v.asInstanceOf[Byte].toLong & 0xffL).toLong
    case ShortType => java.lang.Long.bitCount(v.asInstanceOf[Short].toLong & 0xffffL).toLong
    case IntegerType => java.lang.Integer.bitCount(v.asInstanceOf[Int]).toLong
    case LongType => java.lang.Long.bitCount(v.asInstanceOf[Long]).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.BitCountCompat.ones($c);"
      case ByteType =>
        s"${ev.value} = (long) java.lang.Long.bitCount(((long) $c) & 0xffL);"
      case ShortType =>
        s"${ev.value} = (long) java.lang.Long.bitCount(((long) $c) & 0xffffL);"
      case IntegerType =>
        s"${ev.value} = (long) java.lang.Integer.bitCount($c);"
      case LongType =>
        s"${ev.value} = (long) java.lang.Long.bitCount($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BitCountCompat =
    copy(child = newChild)

  override def prettyName: String = "bit_count"
}

object BitCountCompat {
  def ones(s: UTF8String): Long = {
    val str = s.toString
    var n = 0L; var i = 0
    while (i < str.length) { if (str.charAt(i) == '1') n += 1; i += 1 }
    n
  }
}
