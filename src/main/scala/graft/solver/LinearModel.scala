package graft.solver

/** Variable integrality kinds, mirroring the reference's `var_type` strings
  * (`'continuous' | 'integer' | 'binary'`,
  * /root/reference/src/highs_extension.cpp:577-587).
  */
sealed trait VarKind
object VarKind {
  case object Continuous extends VarKind
  case object Integer extends VarKind
  case object Binary extends VarKind

  /** Reference semantics: unknown type strings fall back to continuous
    * (highs_extension.cpp:586-587).
    */
  def fromString(s: String): VarKind = s match {
    case "binary"  => Binary
    case "integer" => Integer
    case _         => Continuous
  }
}

/** An LP/MIP in the reference's "range" form (highs_extension.cpp:544-590):
  *
  *   minimize    c'x
  *   subject to  rowLower <= A x <= rowUpper
  *               colLower <=   x <= colUpper
  *
  * Sense is always minimize (the reference fixes `sense_ = kMinimize` at
  * model construction, highs_extension.cpp:43, and exposes no maximize API).
  * Magnitudes >= 1e30 are treated as infinities, matching the reference's
  * use of +-1e30 bounds (test/sql/highs.test:33-42).
  *
  * The constraint matrix arrives as COO triples. The reference appends
  * duplicate (row, col) entries verbatim (highs_extension.cpp:435-436); we
  * sum duplicates, the standard sparse-matrix semantic.
  */
final case class LinearModel(
    nCols: Int,
    nRows: Int,
    colCost: Array[Double],
    colLower: Array[Double],
    colUpper: Array[Double],
    rowLower: Array[Double],
    rowUpper: Array[Double],
    entries: Array[(Int, Int, Double)], // (row, col, value)
    kinds: Array[VarKind]
) {
  require(colCost.length == nCols && colLower.length == nCols &&
    colUpper.length == nCols && kinds.length == nCols)
  require(rowLower.length == nRows && rowUpper.length == nRows)

  def hasIntegers: Boolean = kinds.exists(_ != VarKind.Continuous)

  /** Binary variables solve with bounds clamped into [0,1]
    * (highs_extension.cpp:577-583). Returns effective (lower, upper).
    */
  def effectiveBounds: (Array[Double], Array[Double]) = {
    val lo = colLower.clone()
    val hi = colUpper.clone()
    var j = 0
    while (j < nCols) {
      if (kinds(j) == VarKind.Binary) {
        lo(j) = math.max(0.0, lo(j))
        hi(j) = math.min(1.0, hi(j))
      }
      j += 1
    }
    (lo, hi)
  }
}

object LinearModel {
  /** Infinity threshold shared with the reference (+-1e30). */
  val Inf: Double = 1e30

  def isFinite(v: Double): Boolean = v > -Inf && v < Inf
}
