package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static codegen targets (StaticInvoke — inlined into whole-stage
  * codegen, no UDF boxing) for the round-16 scalar-parity pack: DuckDB
  * math/encoding scalars Spark lacks, each value-pinned against DuckDB
  * 1.0 in the q135 lane / SqlEntryPointsSpec.
  */
object ScalarCompat {

  /** Euclid; DuckDB gcd(0, 0) = 0, sign dropped. */
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0 else math.abs(a / gcd(a, b) * b)

  /** DuckDB even(): round AWAY from zero to the next even integer;
    * already-even integers stay (even(2.0) = 2, even(3.0) = 4,
    * even(-2.5) = -4).
    */
  def even(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return x
    val sign = if (x < 0) -1.0 else 1.0
    var v = math.ceil(math.abs(x))
    if (v % 2 != 0) v += 1
    sign * v
  }

  /** DuckDB to_base(n, radix): digits uppercased, no sign handling for
    * the pinned non-negative domain; minLength zero-pads on the left.
    */
  def toBase(n: Long, radix: Int, minLength: Int): UTF8String = {
    require(radix >= 2 && radix <= 36, s"to_base: radix $radix out of [2, 36]")
    val s = java.lang.Long.toString(n, radix).toUpperCase
    UTF8String.fromString(
      if (s.length >= minLength) s
      else ("0" * (minLength - s.length)) + s)
  }
  def toBase(n: Long, radix: Int): UTF8String = toBase(n, radix, 0)
}
