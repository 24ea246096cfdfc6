package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Value-frequency aggregates under DuckDB's names: `histogram(x)` —
  * MAP(value → count), keys ascending, NULL inputs dropped, empty/
  * all-NULL group → NULL — and `entropy(x)` — Shannon entropy (log2)
  * of the value distribution, empty group → 0.0. Both pinned against
  * DuckDB 1.0.
  *
  * One shared [[FreqAggBase]] buffer (a value→count hash map) with
  * map-side partial aggregation: per-group state is O(distinct values),
  * counts merge additively across partitions — the same contract as
  * Spark's own collect_set, and like it, intended for columns whose
  * per-group cardinality is bounded (a histogram over a billion
  * distinct keys is a grouped count, not a histogram). Supported child
  * types: integral, string, boolean, date, timestamp, float, double —
  * each with an explicit byte codec for buffer shuffle serialization.
  */
abstract class FreqAggBase extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true

  protected def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
      BooleanType | DateType | TimestampType | TimestampNTZType |
      FloatType | DoubleType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support ${child.dataType.simpleString} " +
        "(integral, string, boolean, date, timestamp, float, double)")

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], row: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(row)
    if (v != null) {
      // UTF8String from an unsafe row may be backed by transient memory —
      // copy before it outlives the row.
      val key = v match {
        case s: UTF8String => s.clone()
        case x => x
      }
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
    }
    buf
  }

  override def merge(a: mutable.HashMap[Any, Long], b: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) =>
      child.dataType match {
        case ByteType => out.writeByte(k.asInstanceOf[Byte].toInt)
        case ShortType => out.writeShort(k.asInstanceOf[Short].toInt)
        case IntegerType | DateType => out.writeInt(k.asInstanceOf[Int])
        case LongType | TimestampType | TimestampNTZType =>
          out.writeLong(k.asInstanceOf[Long])
        case FloatType => out.writeFloat(k.asInstanceOf[Float])
        case DoubleType => out.writeDouble(k.asInstanceOf[Double])
        case BooleanType => out.writeBoolean(k.asInstanceOf[Boolean])
        case StringType =>
          val b = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case other => throw new IllegalStateException(other.simpleString)
      }
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any = child.dataType match {
        case ByteType => in.readByte()
        case ShortType => in.readShort()
        case IntegerType | DateType => in.readInt()
        case LongType | TimestampType | TimestampNTZType => in.readLong()
        case FloatType => in.readFloat()
        case DoubleType => in.readDouble()
        case BooleanType => in.readBoolean()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        case other => throw new IllegalStateException(other.simpleString)
      }
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }
}

/** `histogram(x)` → MAP(x → BIGINT count), keys ascending. */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(child.dataType)
    val entries = buf.toArray.sortBy(_._1)(ord.asInstanceOf[Ordering[Any]])
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistogramAgg =
    copy(child = c(0))
  override def prettyName: String = "histogram"
}

/** `entropy(x)` → Shannon entropy (bits) of the value counts; 0.0 for
  * an empty or single-valued group.
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return 0.0
    val total = buf.valuesIterator.sum.toDouble
    var h = 0.0
    buf.valuesIterator.foreach { c =>
      val p = c / total
      h -= p * (math.log(p) / math.log(2.0))
    }
    if (h == -0.0) 0.0 else h
  }

  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): EntropyAgg =
    copy(child = c(0))
  override def prettyName: String = "entropy"
}

/** `mad(x)` — median absolute deviation, DuckDB 1.0 pinned:
  * median(abs(x - median(x))) with percentile_cont(0.5) interpolation
  * at both levels (even counts average the two middle order
  * statistics), NULLs dropped, empty group → NULL, single value → 0.0,
  * numeric input computed as DOUBLE (the registration casts).
  *
  * The nested-aggregate shape has no one-pass SQL form; the buffer is
  * the SAME value→count map the histogram aggregate carries (map-side
  * partial merge, per-group state O(distinct values)), and both medians
  * resolve exactly from the weighted order statistics at eval — no
  * second pass over the data, no per-row buffer.
  */
case class MadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def dataType: DataType = DoubleType

  override protected def supported(dt: DataType): Boolean =
    dt == DoubleType // the registration casts numerics to DOUBLE

  /** k-th (0-based) order statistic of the weighted sorted values. */
  private def orderStat(sorted: Array[(Double, Long)], k: Long): Double = {
    var c = 0L
    var i = 0
    while (i < sorted.length) {
      c += sorted(i)._2
      if (c > k) return sorted(i)._1
      i += 1
    }
    sorted(sorted.length - 1)._1
  }

  /** percentile_cont(0.5) over the weighted multiset. */
  private def contMedian(sorted: Array[(Double, Long)], n: Long): Double =
    if (n % 2 == 1) orderStat(sorted, n / 2)
    else (orderStat(sorted, n / 2 - 1) + orderStat(sorted, n / 2)) / 2.0

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val entries = buf.toArray
      .map { case (k, n) => (k.asInstanceOf[Double], n) }.sortBy(_._1)
    val total = entries.iterator.map(_._2).sum
    val m = contMedian(entries, total)
    val devs = entries.map { case (v, n) => (math.abs(v - m), n) }
    val merged = mutable.LinkedHashMap.empty[Double, Long]
    devs.foreach { case (d, n) => merged.update(d, merged.getOrElse(d, 0L) + n) }
    contMedian(merged.toArray.sortBy(_._1), total)
  }

  override def withNewMutableAggBufferOffset(o: Int): MadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MadAgg =
    copy(child = c(0))
  override def prettyName: String = "mad"
}
