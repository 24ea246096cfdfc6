package graft.solver

/** Dense LU factorization with partial pivoting of a square matrix, with
  * solves for both A x = b and A' x = b (the simplex needs both: B w = a_j
  * for the pivot direction and B' y = c_B for the duals).
  *
  * Basis matrices here are tiny (rows = constraint count of a single LP
  * model, tens to low hundreds), so a fresh O(m^3) factorization per simplex
  * iteration is cheap and avoids the numerical drift of product-form
  * updates.
  */
final class DenseLU(a: Array[Array[Double]]) {
  private val m = a.length
  // lu holds the factors of P*A (row-permuted A): unit-lower L below the
  // diagonal, U on and above it.
  private val lu: Array[Array[Double]] = Array.tabulate(m)(i => a(i).clone())
  // perm(i) = original row index now sitting at position i of P*A.
  private val perm: Array[Int] = Array.range(0, m)
  var singular: Boolean = false

  {
    var k = 0
    while (k < m && !singular) {
      var p = k
      var best = math.abs(lu(k)(k))
      var i = k + 1
      while (i < m) {
        val v = math.abs(lu(i)(k))
        if (v > best) { best = v; p = i }
        i += 1
      }
      if (best < 1e-12) {
        singular = true
      } else {
        if (p != k) {
          val tr = lu(p); lu(p) = lu(k); lu(k) = tr
          val tp = perm(p); perm(p) = perm(k); perm(k) = tp
        }
        val pivot = lu(k)(k)
        i = k + 1
        while (i < m) {
          val f = lu(i)(k) / pivot
          lu(i)(k) = f
          if (f != 0.0) {
            var jj = k + 1
            val rowI = lu(i); val rowK = lu(k)
            while (jj < m) { rowI(jj) -= f * rowK(jj); jj += 1 }
          }
          i += 1
        }
      }
      k += 1
    }
  }

  /** Solve A x = b. */
  def solve(b: Array[Double]): Array[Double] = {
    val x = new Array[Double](m)
    // forward: L z = P b
    var i = 0
    while (i < m) {
      var s = b(perm(i))
      val row = lu(i)
      var j = 0
      while (j < i) { s -= row(j) * x(j); j += 1 }
      x(i) = s
      i += 1
    }
    // backward: U x = z
    i = m - 1
    while (i >= 0) {
      var s = x(i)
      val row = lu(i)
      var j = i + 1
      while (j < m) { s -= row(j) * x(j); j += 1 }
      x(i) = s / row(i)
      i -= 1
    }
    x
  }

  /** Solve A' x = b.  With P A = L U we have A' = U' L' P, so solve
    * U' y = b (forward), L' z = y (backward), then x = P' z.
    */
  def solveT(b: Array[Double]): Array[Double] = {
    val y = new Array[Double](m)
    var i = 0
    while (i < m) {
      var s = b(i)
      var j = 0
      while (j < i) { s -= lu(j)(i) * y(j); j += 1 }
      y(i) = s / lu(i)(i)
      i += 1
    }
    val z = new Array[Double](m)
    i = m - 1
    while (i >= 0) {
      var s = y(i)
      var j = i + 1
      while (j < m) { s -= lu(j)(i) * z(j); j += 1 }
      z(i) = s
      i -= 1
    }
    val x = new Array[Double](m)
    i = 0
    while (i < m) { x(perm(i)) = z(i); i += 1 }
    x
  }
}
