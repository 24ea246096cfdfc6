package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB bracket-operator semantics as typed expressions, emitted by
  * [[graft.sql.DuckLiteralRewrite]] when a pasted DuckDB statement uses
  * `x[i]` / `x[b:e]` (reference host DuckDB 1.3 —
  * /root/reference/.github/workflows/MainDistributionPipeline.yml:29;
  * bracket indexing is 1-based there where Spark's native `x[i]` is
  * 0-based, and Spark's `element_at` raises under ANSI where DuckDB
  * returns NULL). Both expressions dispatch on the RESOLVED child type
  * (list / string / struct / map), like [[Len]]. They are
  * CodegenFallback: the bracket rewrite is the pasted-script
  * compatibility path, not the 100 TB hot path — the codegen'd forms
  * (`element_at`, `slice`, `substring`, `list_slice`) remain the native
  * spellings a tuned pipeline writes.
  */

/** `duck_index(x, i)`: 1-based element extraction; negative counts from
  * the end; 0 and out-of-bounds yield NULL (never an ANSI error).
  * Lists and strings index positionally; structs and maps take a key
  * (struct keys must be foldable strings — resolved once at plan time).
  */
case class DuckIndex(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true

  // For structs the field ordinal is fixed at plan time (the key must be
  // a constant); unknown keys resolve to -1 → NULL, DuckDB-style.
  private lazy val structOrdinal: Int = left.dataType match {
    case s: StructType if right.foldable =>
      val k = right.eval(null)
      // Case-insensitive, like DuckDB's struct bracket access.
      if (k == null) -1
      else s.fieldNames.indexWhere(_.equalsIgnoreCase(k.toString))
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(_, _) | StringType => right.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"list/string index must be integral, got ${other.simpleString}")
    }
    case _: StructType =>
      if (right.foldable && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "struct['key'] requires a constant string key")
    case m: MapType =>
      val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
      if (right.dataType == m.keyType ||
        (integral(right.dataType) && integral(m.keyType)))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"map key type ${m.keyType.simpleString} expected, " +
          s"got ${right.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"duck_index requires list, string, struct, or map, got ${other.simpleString}")
  }

  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case StringType => StringType
    case s: StructType =>
      if (structOrdinal >= 0) s.fields(structOrdinal).dataType else NullType
    // DuckDB 1.0 pinned: map[key] returns a LIST of the matching values
    // (empty when absent), not a bare value.
    case m: MapType => ArrayType(m.valueType, m.valueContainsNull)
    case other => other
  }

  /** 1-based position resolved against length n; 0 when invalid.
    * Long.MinValue is rejected explicitly — negating it overflows back
    * to itself, which would alias a wrapped in-bounds index.
    */
  private def pos(i: Long, n: Int): Int =
    if (i > 0 && i <= n) i.toInt
    else if (i < 0 && i != Long.MinValue && -i <= n) (n + i + 1).toInt
    else 0

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    // DuckDB 1.0 pinned: a NULL map or NULL key yields the EMPTY list —
    // map['k'] and map_extract agree — where every other input type
    // propagates NULL. The map arm therefore dispatches before the
    // null-input early return.
    if (v == null) left.dataType match {
      case _: MapType => return new GenericArrayData(Array.empty[Any])
      case _ => return null
    }
    left.dataType match {
      case ArrayType(et, _) =>
        val i = right.eval(input)
        if (i == null) return null
        val arr = v.asInstanceOf[ArrayData]
        val p = pos(i.asInstanceOf[Number].longValue(), arr.numElements())
        if (p == 0) null
        else if (arr.isNullAt(p - 1)) null
        else arr.get(p - 1, et)
      case StringType =>
        val i = right.eval(input)
        if (i == null) return null
        val s = v.asInstanceOf[UTF8String]
        val p = pos(i.asInstanceOf[Number].longValue(), s.numChars())
        if (p == 0) null else s.substringSQL(p, 1)
      case s: StructType =>
        if (structOrdinal < 0) null
        else {
          val row = v.asInstanceOf[InternalRow]
          if (row.isNullAt(structOrdinal)) null
          else row.get(structOrdinal, s.fields(structOrdinal).dataType)
        }
      case m: MapType =>
        val k = right.eval(input)
        if (k == null) return new GenericArrayData(Array.empty[Any])
        val map = v.asInstanceOf[MapData]
        val keys = map.keyArray()
        val n = map.numElements()
        // integral keys compare widened (the literal's type need not
        // match the map's exact integral width)
        def matches(x: Any): Boolean = (x, k) match {
          case (a: Number, b: Number)
            if !x.isInstanceOf[Double] && !x.isInstanceOf[Float] &&
              !k.isInstanceOf[Double] && !k.isInstanceOf[Float] =>
            a.longValue() == b.longValue()
          case _ => x == k
        }
        val out = Seq.newBuilder[Any]
        var i = 0
        while (i < n) {
          if (!keys.isNullAt(i) && matches(keys.get(i, m.keyType)))
            out += (if (map.valueArray().isNullAt(i)) null
              else map.valueArray().get(i, m.valueType))
          i += 1
        }
        new GenericArrayData(out.result())
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckIndex =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "duck_index"
}

/** `duck_slice(x, b, e)`: DuckDB's 1-based INCLUSIVE slice over lists
  * and strings. NULL bounds mean "omitted" (`x[:e]` / `x[b:]`);
  * negative bounds count from the end; bounds clamp to the valid range
  * and an inverted range yields the empty list/string — all pinned
  * against DuckDB 1.0 (`[10,20,30,40][-3:-2]` → `[20,30]`,
  * `[0:2]` → `[10,20]`, `[3:10]` → `[30,40]`, `[3:2]` → `[]`).
  */
case class DuckSlice(child: Expression, lower: Expression, upper: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, lower, upper)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) | StringType =>
      if (Seq(lower, upper).forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType | NullType => true
        case _ => false
      }))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "slice bounds must be integral")
    case other => TypeCheckResult.TypeCheckFailure(
      s"duck_slice requires list or string, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  /** (from, until) as a 0-based exclusive window, clamped; DuckDB's
    * b..e inclusive 1-based with negative-from-end resolution.
    */
  private def window(bv: Any, ev: Any, n: Int): (Int, Int) = {
    val b0 = if (bv == null) 1L else bv.asInstanceOf[Number].longValue()
    val e0 = if (ev == null) n.toLong else ev.asInstanceOf[Number].longValue()
    val b1 = if (b0 < 0) n + b0 + 1 else b0
    val e1 = if (e0 < 0) n + e0 + 1 else e0
    val from = math.max(b1, 1L)
    val until = math.min(e1, n.toLong) + 1
    if (until <= from) (0, 0) else (from.toInt - 1, until.toInt - 1)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bv = lower.eval(input)
    val ev = upper.eval(input)
    child.dataType match {
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        val (from, until) = window(bv, ev, arr.numElements())
        val out = new Array[Any](until - from)
        var i = from
        while (i < until) {
          out(i - from) = if (arr.isNullAt(i)) null else arr.get(i, et)
          i += 1
        }
        new GenericArrayData(out)
      case StringType =>
        val s = v.asInstanceOf[UTF8String]
        val (from, until) = window(bv, ev, s.numChars())
        s.substringSQL(from + 1, until - from)
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSlice =
    copy(child = newChildren(0), lower = newChildren(1), upper = newChildren(2))

  override def prettyName: String = "duck_slice"
}

/** DuckDB's 2-arg `map(keys_list, values_list)` constructor sharing its
  * name with the variadic `map(k1, v1, ...)` (round 17): two ARRAY
  * arguments build the map by zipping the lists (DuckDB's constructor;
  * duplicate keys error under Spark's default EXCEPTION dedup policy,
  * matching DuckDB's constraint error), while any other 2-arg shape
  * keeps Spark's native single-entry semantics — `MAP {k: v}` literals
  * lower onto exactly that call. Dispatch happens on the RESOLVED child
  * types via a lazily-built inner expression, so unresolved-analysis
  * never needs the answer early.
  */
case class DuckMap2(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)

  @transient private lazy val impl: Expression =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, _), ArrayType(_, _)) =>
        org.apache.spark.sql.catalyst.expressions.MapFromArrays(left, right)
      case _ =>
        org.apache.spark.sql.catalyst.expressions.CreateMap(Seq(left, right))
    }

  override def dataType: DataType = impl.dataType
  override def nullable: Boolean = impl.nullable
  override def foldable: Boolean = impl.foldable
  override def checkInputDataTypes(): TypeCheckResult =
    impl.checkInputDataTypes()
  override def eval(input: InternalRow): Any = impl.eval(input)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckMap2 =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "map"
}

/** DuckDB's `datetrunc(part, x)` — date_trunc that PRESERVES the input
  * family (round 17, pinned on 1.0: datetrunc('month', DATE) is a DATE,
  * datetrunc('month', TIMESTAMP) a TIMESTAMP; Spark's date_trunc always
  * yields a timestamp). Dispatch on the resolved child type via a
  * lazily-built inner expression; 'day' over a DATE is the identity
  * (TruncDate has no DAY format).
  */
case class DuckDateTrunc(part: Expression, child: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(part, child)

  @transient private lazy val impl: Expression = child.dataType match {
    case DateType =>
      val p = if (part.foldable) String.valueOf(part.eval(null)).toLowerCase
        else ""
      if (Set("day", "days", "d", "dayofmonth")(p)) child
      else org.apache.spark.sql.catalyst.expressions.TruncDate(child, part)
    case _ =>
      // the inner expression is invisible to ResolveTimeZone — set the
      // session zone explicitly or TruncTimestamp NPEs at eval
      val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      org.apache.spark.sql.catalyst.expressions.TruncTimestamp(part,
        org.apache.spark.sql.catalyst.expressions.Cast(child, TimestampType,
          tz), tz)
  }

  override def dataType: DataType = impl.dataType
  override def nullable: Boolean = impl.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (!part.foldable)
      TypeCheckResult.TypeCheckFailure("datetrunc part must be a constant")
    else impl.checkInputDataTypes()
  override def eval(input: InternalRow): Any = impl.eval(input)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckDateTrunc =
    copy(part = newChildren(0), child = newChildren(1))

  override def prettyName: String = "datetrunc"
}
