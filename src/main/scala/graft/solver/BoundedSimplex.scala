package graft.solver

/** Statuses mirror the reference's mapping of HighsModelStatus to row text
  * (highs_extension.cpp:653-667): Optimal | Infeasible | Unbounded |
  * anything-else -> Unknown.
  */
sealed trait LpStatus
object LpStatus {
  case object Optimal extends LpStatus
  case object Infeasible extends LpStatus
  case object Unbounded extends LpStatus
  case object Unknown extends LpStatus // iteration limit / numerical failure
}

/** LP solution: primal values and reduced costs for the structural columns,
  * duals for the rows, objective value. `reducedCost(j)` follows the
  * minimization convention (>= 0 at lower bound, <= 0 at upper bound,
  * exactly 0.0 for basic columns) — the same values HiGHS reports as
  * `col_dual` and the reference exposes as the `reduced_cost` column
  * (highs_extension.cpp:605-608, test/sql/highs.test:94-98).
  */
final case class LpSolution(
    status: LpStatus,
    x: Array[Double],
    reducedCost: Array[Double],
    rowDual: Array[Double],
    objective: Double,
    iterations: Int
)

/** Bounded-variable primal simplex over the range form
  *
  *   min c'x   s.t.   rowLower <= A x <= rowUpper,  colLower <= x <= colUpper
  *
  * Internally rewritten with one slack per row, s = A x, giving the equality
  * system [A | -I] z = 0 with bounds on every variable; the initial basis is
  * the slack identity. Phase 1 is the composite (artificial-free) method:
  * basic variables outside their bounds get a +-1 infeasibility cost and
  * their violated bound becomes the blocking bound in the ratio test, so
  * feasibility is restored while the same pivot machinery runs. Dantzig
  * pricing with a Bland's-rule fallback for anti-cycling; dense LU
  * refactorization every iteration (models are tiny — see DenseLU).
  *
  * This is a from-scratch implementation: neither breeze nor commons-math3
  * (the only optimizers on the classpath) exposes reduced costs, bounded
  * variables, or range constraints, all of which the reference's output
  * contract requires.
  */
object BoundedSimplex {
  import LinearModel.{Inf, isFinite}

  private val FeasTol = 1e-7
  private val DualTol = 1e-7
  private val PivTol = 1e-9

  private val Basic = 0
  private val AtLower = 1
  private val AtUpper = 2
  private val Free = 3

  def solve(model: LinearModel): LpSolution =
    solve(model, model.colLower, model.colUpper)

  /** Solve with overridden column bounds (used by branch-and-bound). */
  def solve(model: LinearModel, loIn: Array[Double], hiIn: Array[Double]): LpSolution = {
    val n = model.nCols
    val m = model.nRows
    val nTot = n + m

    // Dense columns of [A | -I]; duplicates in the COO input are summed.
    val cols = Array.fill(nTot)(new Array[Double](m))
    for ((r, c, v) <- model.entries) cols(c)(r) += v
    var i = 0
    while (i < m) { cols(n + i)(i) = -1.0; i += 1 }

    val lo = new Array[Double](nTot)
    val hi = new Array[Double](nTot)
    var j = 0
    while (j < n) {
      lo(j) = if (loIn(j) <= -Inf) Double.NegativeInfinity else loIn(j)
      hi(j) = if (hiIn(j) >= Inf) Double.PositiveInfinity else hiIn(j)
      j += 1
    }
    i = 0
    while (i < m) {
      lo(n + i) = if (model.rowLower(i) <= -Inf) Double.NegativeInfinity else model.rowLower(i)
      hi(n + i) = if (model.rowUpper(i) >= Inf) Double.PositiveInfinity else model.rowUpper(i)
      i += 1
    }
    // Crossed bounds => trivially infeasible.
    j = 0
    while (j < nTot) {
      if (lo(j) > hi(j) + FeasTol)
        return LpSolution(LpStatus.Infeasible, new Array[Double](n), new Array[Double](n), new Array[Double](m), 0.0, 0)
      j += 1
    }

    val cost = new Array[Double](nTot)
    System.arraycopy(model.colCost, 0, cost, 0, n)

    // Initial point: slacks basic, structurals nonbasic at a finite bound
    // (lower preferred), free structurals at 0.
    val vstat = new Array[Int](nTot)
    val xval = new Array[Double](nTot)
    j = 0
    while (j < n) {
      if (!lo(j).isNegInfinity) { vstat(j) = AtLower; xval(j) = lo(j) }
      else if (!hi(j).isPosInfinity) { vstat(j) = AtUpper; xval(j) = hi(j) }
      else { vstat(j) = Free; xval(j) = 0.0 }
      j += 1
    }
    val basis = new Array[Int](m)
    i = 0
    while (i < m) { basis(i) = n + i; vstat(n + i) = Basic; i += 1 }

    val maxIter = 20000 + 200 * nTot
    val blandAfter = 5000 + 20 * nTot
    var iter = 0
    var finalDuals: Array[Double] = null

    var done = false
    var resultStatus: LpStatus = LpStatus.Unknown

    while (!done) {
      iter += 1
      if (iter > maxIter) { resultStatus = LpStatus.Unknown; done = true }
      else {
        // Refactorize the basis and recompute basic values from scratch.
        val bMat = Array.tabulate(m, m)((r, k) => cols(basis(k))(r))
        val lu = new DenseLU(bMat)
        if (lu.singular) { resultStatus = LpStatus.Unknown; done = true }
        else {
          val rhs = new Array[Double](m) // b - N x_N with b = 0
          j = 0
          while (j < nTot) {
            if (vstat(j) != Basic && xval(j) != 0.0) {
              val colJ = cols(j)
              var r = 0
              while (r < m) { rhs(r) -= colJ(r) * xval(j); r += 1 }
            }
            j += 1
          }
          val xB = lu.solve(rhs)
          var k = 0
          while (k < m) { xval(basis(k)) = xB(k); k += 1 }

          // Phase detection + objective-row costs for the basis.
          var infeas = 0.0
          val cB = new Array[Double](m)
          k = 0
          while (k < m) {
            val bj = basis(k); val v = xB(k)
            if (v > hi(bj) + FeasTol) { infeas += v - hi(bj); cB(k) = 1.0 }
            else if (v < lo(bj) - FeasTol) { infeas += lo(bj) - v; cB(k) = -1.0 }
            else cB(k) = 0.0
            k += 1
          }
          val phase1 = infeas > FeasTol
          if (!phase1) {
            k = 0
            while (k < m) { cB(k) = cost(basis(k)); k += 1 }
          }
          val y = lu.solveT(cB)

          // Pricing.
          val useBland = iter > blandAfter
          var enter = -1
          var enterDir = 0
          var bestScore = DualTol
          j = 0
          while (j < nTot && (enter == -1 || !useBland)) {
            if (vstat(j) != Basic) {
              val cj = if (phase1) 0.0 else cost(j)
              var d = cj
              val colJ = cols(j)
              var r = 0
              while (r < m) { d -= y(r) * colJ(r); r += 1 }
              val st = vstat(j)
              if ((st == AtLower || st == Free) && d < -DualTol && -d > bestScore) {
                enter = j; enterDir = 1
                if (!useBland) bestScore = -d
              } else if ((st == AtUpper || st == Free) && d > DualTol && d > bestScore) {
                enter = j; enterDir = -1
                if (!useBland) bestScore = d
              }
            }
            j += 1
          }

          if (enter == -1) {
            if (phase1) { resultStatus = LpStatus.Infeasible; finalDuals = y; done = true }
            else { resultStatus = LpStatus.Optimal; finalDuals = y; done = true }
          } else {
            val w = lu.solve(cols(enter))
            // Ratio test. t = step of the entering variable in direction
            // enterDir; basic k moves at rate -enterDir * w(k).
            var t = if (!lo(enter).isInfinity && !hi(enter).isInfinity)
              hi(enter) - lo(enter) // bound-flip distance
            else Double.PositiveInfinity
            var blockK = -1
            var blockStat = AtLower
            var blockVal = 0.0
            var blockMag = 0.0
            k = 0
            while (k < m) {
              val delta = -enterDir * w(k)
              if (math.abs(delta) > PivTol) {
                val bj = basis(k); val v = xB(k)
                // Working bounds: an infeasible basic blocks only at the
                // bound it violates (composite phase 1).
                var wlo = lo(bj); var whi = hi(bj)
                var hitStatLo = AtLower; var hitStatHi = AtUpper
                if (v > hi(bj) + FeasTol) { wlo = hi(bj); whi = Double.PositiveInfinity; hitStatLo = AtUpper }
                else if (v < lo(bj) - FeasTol) { whi = lo(bj); wlo = Double.NegativeInfinity; hitStatHi = AtLower }
                var tk = Double.PositiveInfinity
                var stat = AtLower; var tgt = 0.0
                if (delta < 0 && !wlo.isNegInfinity) {
                  tk = (v - wlo) / (-delta); stat = hitStatLo; tgt = wlo
                } else if (delta > 0 && !whi.isPosInfinity) {
                  tk = (whi - v) / delta; stat = hitStatHi; tgt = whi
                }
                if (tk < t - 1e-12 ||
                    (tk < t + 1e-12 && blockK != -1 &&
                      (if (useBland) basis(k) < basis(blockK)
                       else math.abs(delta) > blockMag))) {
                  t = math.max(tk, 0.0); blockK = k; blockStat = stat
                  blockVal = tgt; blockMag = math.abs(delta)
                }
              }
              k += 1
            }

            if (t.isPosInfinity) {
              // Phase 1's objective is bounded below by 0 with blocking at
              // violated bounds, so an unbounded ray here is phase 2.
              resultStatus = if (phase1) LpStatus.Unknown else LpStatus.Unbounded
              finalDuals = y
              done = true
            } else if (blockK == -1) {
              // Bound flip: entering runs to its opposite bound.
              if (enterDir > 0) { vstat(enter) = AtUpper; xval(enter) = hi(enter) }
              else { vstat(enter) = AtLower; xval(enter) = lo(enter) }
            } else {
              xval(enter) = xval(enter) + enterDir * t
              val leaving = basis(blockK)
              vstat(leaving) = blockStat
              xval(leaving) = blockVal
              basis(blockK) = enter
              vstat(enter) = Basic
            }
          }
        }
      }
    }

    // Assemble outputs in the structural space.
    val x = new Array[Double](n)
    j = 0
    while (j < n) { x(j) = xval(j); j += 1 }
    val rc = new Array[Double](n)
    val rowDual = new Array[Double](m)
    if (finalDuals != null && resultStatus == LpStatus.Optimal) {
      j = 0
      while (j < n) {
        if (vstat(j) == Basic) rc(j) = 0.0
        else {
          var d = cost(j)
          val colJ = cols(j)
          var r = 0
          while (r < m) { d -= finalDuals(r) * colJ(r); r += 1 }
          rc(j) = d
        }
        j += 1
      }
      // Row dual = reduced cost of the slack with our [A | -I] convention.
      i = 0
      while (i < m) { rowDual(i) = finalDuals(i); i += 1 }
    }
    var obj = 0.0
    j = 0
    while (j < n) { obj += model.colCost(j) * x(j); j += 1 }
    LpSolution(resultStatus, x, rc, rowDual, obj, iter)
  }
}
