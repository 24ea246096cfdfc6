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

/** DuckDB's `bitstring_agg(x[, min, max])` (round 18): a bitstring —
  * modeled as its VARCHAR form like the rest of the BIT lane — with one
  * position per integer in [min, max], '1' where the value occurred.
  * The 1-arg form derives the range from the COLUMN-WIDE min/max
  * (DuckDB pulls them from table statistics, so all groups share one
  * range). A global (ungrouped) 1-arg call computes that range here
  * directly — the group IS the column; the GROUP BY case is rewritten
  * by [[graft.sql.BitstringGlobalRange]] into per-group collect_set +
  * a column-wide range so groups lacking the global extremes still get
  * full-length, correctly-positioned strings. The 3-arg form
  * takes explicit FOLDABLE bounds and raises DuckDB's out-of-range
  * error text for values outside them. NULLs are ignored; an all-NULL
  * or empty group yields NULL. State is the distinct-value set plus
  * observed extremes — O(distinct) with map-side partial aggregation,
  * the [[FreqAggBase]] envelope.
  */
case class BitstringAgg(
    child: Expression, loExpr: Option[Expression], hiExpr: Option[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[BitstringAgg.Buf] {

  override def children: Seq[Expression] =
    Seq(child) ++ loExpr.toSeq ++ hiExpr.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      if (loExpr.forall(_.foldable) && hiExpr.forall(_.foldable))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bitstring_agg bounds must be constants")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitstring_agg requires an integer column, got ${other.simpleString}")
  }

  private lazy val bounds: Option[(Long, Long)] = (loExpr, hiExpr) match {
    case (Some(l), Some(h)) =>
      val lv = l.eval(null); val hv = h.eval(null)
      if (lv == null || hv == null) None
      else Some((lv.asInstanceOf[Number].longValue(),
        hv.asInstanceOf[Number].longValue()))
    case _ => None
  }

  override def createAggregationBuffer(): BitstringAgg.Buf =
    new BitstringAgg.Buf(Long.MaxValue, Long.MinValue,
      scala.collection.mutable.HashSet.empty[Long])

  override def update(buf: BitstringAgg.Buf, row: org.apache.spark.sql
      .catalyst.InternalRow): BitstringAgg.Buf = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue()
      bounds.foreach { case (lo, hi) =>
        if (x < lo || x > hi) throw new IllegalArgumentException(
          s"Out of Range Error: Value $x is outside of provided min and " +
            s"max range ($lo <-> $hi)")
      }
      if (x < buf.min) buf.min = x
      if (x > buf.max) buf.max = x
      buf.set += x
    }
    buf
  }

  override def merge(a: BitstringAgg.Buf, b: BitstringAgg.Buf): BitstringAgg.Buf = {
    if (b.min < a.min) a.min = b.min
    if (b.max > a.max) a.max = b.max
    a.set ++= b.set
    a
  }

  override def eval(buf: BitstringAgg.Buf): Any = {
    if (buf.set.isEmpty) return null
    val (lo, hi) = bounds.getOrElse((buf.min, buf.max))
    val n = hi - lo + 1
    if (n <= 0 || n > 1000000) throw new IllegalArgumentException(
      s"bitstring_agg range [$lo, $hi] is empty or over 1e6 positions")
    val sb = new java.lang.StringBuilder(n.toInt)
    var i = 0L
    while (i < n) { sb.append(if (buf.set.contains(lo + i)) '1' else '0'); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: BitstringAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (2 + 1 + buf.set.size))
    bb.putLong(buf.min); bb.putLong(buf.max); bb.putLong(buf.set.size.toLong)
    buf.set.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BitstringAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val mn = bb.getLong; val mx = bb.getLong; val sz = bb.getLong
    val s = scala.collection.mutable.HashSet.empty[Long]
    var i = 0L
    while (i < sz) { s += bb.getLong; i += 1 }
    new BitstringAgg.Buf(mn, mx, s)
  }

  override def withNewMutableAggBufferOffset(o: Int): BitstringAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitstringAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BitstringAgg =
    copy(child = c(0),
      loExpr = if (c.length > 1) Some(c(1)) else None,
      hiExpr = if (c.length > 2) Some(c(2)) else None)
  override def prettyName: String = "bitstring_agg"
}

object BitstringAgg {
  final class Buf(var min: Long, var max: Long,
      val set: scala.collection.mutable.HashSet[Long])
}

/** Scalar companion to [[BitstringAgg]] for the GROUPED 1-arg form
  * (spliced by [[graft.sql.BitstringGlobalRange]]): renders one
  * group's distinct-value set against the COLUMN-WIDE [lo, hi] range,
  * so every group's bitstring has the same length and bit positions —
  * DuckDB's statistics-derived semantics. NULL for an empty/NULL set
  * (all-NULL group), same 1e6-position guard as the aggregate.
  */
case class BitstringFromSet(set: Expression, lo: Expression, hi: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def children: Seq[Expression] = Seq(set, lo, hi)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = set.eval(input)
    if (s == null) return null
    val arr = s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() == 0) return null
    val loV = lo.eval(input); val hiV = hi.eval(input)
    if (loV == null || hiV == null) return null
    val l = loV.asInstanceOf[Number].longValue()
    val h = hiV.asInstanceOf[Number].longValue()
    val n = h - l + 1
    if (n <= 0 || n > 1000000) throw new IllegalArgumentException(
      s"bitstring_agg range [$l, $h] is empty or over 1e6 positions")
    val et = set.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val present = new java.util.HashSet[Long]()
    var i = 0
    while (i < arr.numElements()) {
      present.add(arr.get(i, et).asInstanceOf[Number].longValue()); i += 1
    }
    val sb = new java.lang.StringBuilder(n.toInt)
    var p = 0L
    while (p < n) { sb.append(if (present.contains(l + p)) '1' else '0'); p += 1 }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BitstringFromSet =
    copy(set = c(0), lo = c(1), hi = c(2))
  override def prettyName: String = "bitstring_from_set"
}
