package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, DateTimeUtils, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's JSON construction functions (round 18):
  *
  *  - `json_quote(x)` — any value as its JSON text (numbers bare,
  *    strings quoted, lists/structs/maps recursive; a NULL input is a
  *    NULL result, not the text "null" — 1.0-pinned).
  *  - `json_array(v1, ...)` — `[...]`, NULL arguments as JSON nulls,
  *    zero arguments `[]`.
  *  - `json_object(k1, v1, ...)` — `{...}`, even arity enforced with
  *    the host's error text.
  *
  * One shared Catalyst-value → Jackson-node conversion does the typed
  * dispatch on the RESOLVED child types (Len-style); Jackson preserves
  * insertion order, matching DuckDB's output. CodegenFallback: these
  * are pasted-script compatibility names, not the 100 TB hot path
  * (to_json stays the native spelling).
  */
object JsonBuild {
  private[graft] val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private val f = JsonNodeFactory.instance

  /** DuckDB's timestamp text: seconds always present (LocalDateTime
    * .toString drops ":00" seconds, diverging on every whole-minute
    * value), fractional micros only when nonzero, trailing zeros
    * trimmed — '2024-01-01 00:00:00', '... 01:02:03.5'.
    */
  private[functions] def timestampText(micros: Long): String = {
    val ldt = DateTimeUtils.microsToLocalDateTime(micros)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
      f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
      f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val us = ldt.getNano / 1000
    if (us == 0) base
    else {
      var frac = f"$us%06d"
      while (frac.endsWith("0")) frac = frac.dropRight(1)
      s"$base.$frac"
    }
  }

  def toNode(dt: DataType, v: Any): JsonNode = {
    if (v == null) return f.nullNode()
    dt match {
      case ByteType => f.numberNode(v.asInstanceOf[Byte].toLong)
      case ShortType => f.numberNode(v.asInstanceOf[Short].toLong)
      case IntegerType => f.numberNode(v.asInstanceOf[Int].toLong)
      case LongType => f.numberNode(v.asInstanceOf[Long])
      case FloatType => f.numberNode(v.asInstanceOf[Float].toDouble)
      case DoubleType => f.numberNode(v.asInstanceOf[Double])
      case _: DecimalType => f.numberNode(v.asInstanceOf[Decimal].toJavaBigDecimal)
      case BooleanType => f.booleanNode(v.asInstanceOf[Boolean])
      case StringType => f.textNode(v.toString)
      case DateType => f.textNode(
        DateTimeUtils.daysToLocalDate(v.asInstanceOf[Int]).toString)
      case TimestampType | TimestampNTZType =>
        f.textNode(timestampText(v.asInstanceOf[Long]))
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        val out = f.arrayNode(arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toNode(et, if (arr.isNullAt(i)) null else arr.get(i, et)))
          i += 1
        }
        out
      case s: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val out = f.objectNode()
        var i = 0
        while (i < s.length) {
          out.set[JsonNode](s(i).name,
            toNode(s(i).dataType, if (row.isNullAt(i)) null else row.get(i, s(i).dataType)))
          i += 1
        }
        out
      case m: MapType =>
        val map = v.asInstanceOf[MapData]
        val out = f.objectNode()
        val ks = map.keyArray(); val vs = map.valueArray()
        var i = 0
        while (i < map.numElements()) {
          val k = if (ks.isNullAt(i)) "null" else {
            val kv = ks.get(i, m.keyType)
            kv match {
              case u: UTF8String => u.toString
              case other => other.toString
            }
          }
          out.set[JsonNode](k,
            toNode(m.valueType, if (vs.isNullAt(i)) null else vs.get(i, m.valueType)))
          i += 1
        }
        out
      case NullType => f.nullNode()
      case other => throw new UnsupportedOperationException(
        s"json_quote/json_array/json_object: unsupported type ${other.simpleString}")
    }
  }

  def write(n: JsonNode): UTF8String =
    UTF8String.fromString(mapper.writeValueAsString(n))
}

/** DuckDB's `x::JSON` / CAST(x AS JSON) (round 18): a STRING operand is
  * VALIDATED and passed through UNCHANGED (the host preserves the
  * original text — ' { "a" : 1 } '::JSON keeps its spaces; malformed
  * input raises the conversion error, or NULL under tryMode/TRY_CAST);
  * any other type converts to its JSON text like json_quote.
  */
case class JsonCastExpr(child: Expression, tryMode: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    child.dataType match {
      case StringType =>
        try { JsonBuild.mapper.readTree(v.toString); v }
        catch {
          case e: Exception =>
            if (tryMode) null
            else throw new IllegalArgumentException(
              s"Conversion Error: Malformed JSON: ${v.toString.take(80)}", e)
        }
      case dt => JsonBuild.write(JsonBuild.toNode(dt, v))
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonCastExpr = copy(child = c(0))
  override def prettyName: String = "json_cast"
}

case class JsonQuoteExpr(child: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else JsonBuild.write(JsonBuild.toNode(child.dataType, v))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonQuoteExpr = copy(child = c(0))
  override def prettyName: String = "json_quote"
}

case class JsonArrayExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val out = JsonBuild.mapper.createArrayNode()
    children.foreach(c => out.add(JsonBuild.toNode(c.dataType, c.eval(input))))
    JsonBuild.write(out)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonArrayExpr = copy(children = c)
  override def prettyName: String = "json_array"
}

case class JsonObjectExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size % 2 != 0)
      TypeCheckResult.TypeCheckFailure(
        "json_object() requires an even number of arguments")
    else if (children.grouped(2).exists(_.head.dataType != StringType))
      TypeCheckResult.TypeCheckFailure("json_object() keys must be strings")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val out = JsonBuild.mapper.createObjectNode()
    children.grouped(2).foreach { kv =>
      val k = kv.head.eval(input)
      out.set[JsonNode](if (k == null) "null" else k.toString,
        JsonBuild.toNode(kv(1).dataType, kv(1).eval(input)))
      ()
    }
    JsonBuild.write(out)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonObjectExpr = copy(children = c)
  override def prettyName: String = "json_object"
}
