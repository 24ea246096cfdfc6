package graft.solver

import org.scalatest.funsuite.AnyFunSuite

class SolverSpec extends AnyFunSuite {
  val Inf = 1e30
  val tol = 1e-6

  test("DenseLU solves A x = b and A' x = b") {
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(-1.0, 3.0, 2.0),
      Array(0.5, 0.0, 1.0))
    val lu = new DenseLU(a.map(_.clone()))
    val b = Array(3.0, 4.0, 1.5)
    val x = lu.solve(b)
    for (i <- 0 until 3) {
      val got = (0 until 3).map(j => a(i)(j) * x(j)).sum
      assert(math.abs(got - b(i)) < 1e-10)
    }
    val xt = lu.solveT(b)
    for (i <- 0 until 3) {
      val got = (0 until 3).map(j => a(j)(i) * xt(j)).sum
      assert(math.abs(got - b(i)) < 1e-10)
    }
  }

  test("golden LP from highs.test: x=0 rc=1, y=1 rc=1, Optimal") {
    val sol = BoundedSimplex.solve(ReferenceModels.golden)
    assert(sol.status == LpStatus.Optimal)
    assert(math.abs(sol.x(0) - 0.0) < tol)
    assert(math.abs(sol.x(1) - 1.0) < tol)
    assert(math.abs(sol.reducedCost(0) - 1.0) < tol)
    assert(math.abs(sol.reducedCost(1) - 1.0) < tol)
    assert(math.abs(sol.objective - 1.0) < tol)
  }

  test("unbounded LP detected") {
    val m = LinearModel(1, 0, Array(-1.0), Array(0.0), Array(Inf),
      Array.empty, Array.empty, Array.empty, Array(VarKind.Continuous))
    assert(BoundedSimplex.solve(m).status == LpStatus.Unbounded)
  }

  test("infeasible LP detected") {
    // x <= -1 and x >= 1 via two rows on the same variable
    val m = LinearModel(1, 2, Array(0.0), Array(-Inf), Array(Inf),
      Array(-Inf, 1.0), Array(-1.0, Inf),
      Array((0, 0, 1.0), (1, 0, 1.0)), Array(VarKind.Continuous))
    assert(BoundedSimplex.solve(m).status == LpStatus.Infeasible)
  }

  test("equality rows: x + y = 4, x - y = 2 -> x=3, y=1") {
    val m = LinearModel(2, 2, Array(1.0, 1.0), Array(-Inf, -Inf), Array(Inf, Inf),
      Array(4.0, 2.0), Array(4.0, 2.0),
      Array((0, 0, 1.0), (0, 1, 1.0), (1, 0, 1.0), (1, 1, -1.0)),
      Array(VarKind.Continuous, VarKind.Continuous))
    val sol = BoundedSimplex.solve(m)
    assert(sol.status == LpStatus.Optimal)
    assert(math.abs(sol.x(0) - 3.0) < tol && math.abs(sol.x(1) - 1.0) < tol)
  }

  test("network-flow LP solves to the brute-force assignment cost") {
    val model = ReferenceModels.networkFlow
    val sol = BoundedSimplex.solve(model)
    assert(sol.status == LpStatus.Optimal)
    val expected = ReferenceModels.bruteForceFlowCost
    assert(math.abs(sol.objective - expected) < tol,
      s"simplex ${sol.objective} vs brute force $expected")
    // Min-cost-flow LP relaxations have integral vertex optima.
    sol.x.foreach(v => assert(math.abs(v - math.rint(v)) < tol))
    checkKkt(model, sol)
  }

  test("datacenter binary MIP solves to the brute-force cost") {
    val model = ReferenceModels.datacenter
    val sol = BranchAndBound.solve(model)
    assert(sol.status == LpStatus.Optimal)
    val expected = ReferenceModels.bruteForceDatacenterCost
    assert(math.abs(sol.objective - expected) < tol,
      s"B&B ${sol.objective} vs brute force $expected")
    sol.x.foreach(v => assert(math.abs(v - math.rint(v)) < tol))
    // Feasibility of the incumbent against every row.
    assertFeasible(model, sol.x)
  }

  test("binary bounds clamp to [0,1] like the reference") {
    // lower=-5, upper=9 on a binary var must behave as [0,1]
    val m = LinearModel(1, 0, Array(-1.0), Array(-5.0), Array(9.0),
      Array.empty, Array.empty, Array.empty, Array(VarKind.Binary))
    val sol = BranchAndBound.solve(m)
    assert(sol.status == LpStatus.Optimal)
    assert(math.abs(sol.x(0) - 1.0) < tol)
  }

  test("integer variable branch-and-bound: knapsack-ish") {
    // max 5a + 4b (min -5a -4b) s.t. 6a + 4b <= 24, a + 2b <= 6, a,b int >= 0
    // LP optimum (3, 1.5) obj -21; best integer point is a=4, b=0 -> -20.
    val m = LinearModel(2, 2, Array(-5.0, -4.0), Array(0.0, 0.0), Array(Inf, Inf),
      Array(-Inf, -Inf), Array(24.0, 6.0),
      Array((0, 0, 6.0), (0, 1, 4.0), (1, 0, 1.0), (1, 1, 2.0)),
      Array(VarKind.Integer, VarKind.Integer))
    val sol = BranchAndBound.solve(m)
    assert(sol.status == LpStatus.Optimal)
    assert(math.abs(sol.objective - (-20.0)) < tol)
    assert(math.abs(sol.x(0) - 4.0) < tol && math.abs(sol.x(1) - 0.0) < tol)
  }

  test("randomized LPs satisfy KKT optimality certificates") {
    val rng = new scala.util.Random(42)
    var optimalSeen = 0
    for (trial <- 0 until 60) {
      val n = 2 + rng.nextInt(6)
      val mRows = 1 + rng.nextInt(6)
      val cost = Array.fill(n)(rng.nextDouble() * 4 - 2)
      val lo = Array.fill(n)(if (rng.nextBoolean()) 0.0 else -Inf)
      val hi = lo.map(l => if (rng.nextBoolean()) (if (l == 0.0) l else 0.0) + rng.nextDouble() * 10 + 1 else Inf)
      val entries = for {
        r <- 0 until mRows; c <- 0 until n if rng.nextDouble() < 0.7
      } yield (r, c, rng.nextDouble() * 4 - 2)
      val rl = new Array[Double](mRows)
      val ru = new Array[Double](mRows)
      for (r <- 0 until mRows) {
        rng.nextInt(3) match {
          case 0 => rl(r) = -Inf; ru(r) = rng.nextDouble() * 10
          case 1 => rl(r) = -rng.nextDouble() * 10; ru(r) = Inf
          case 2 => val v = rng.nextDouble() * 6 - 3; rl(r) = v; ru(r) = v + rng.nextDouble() * 2
        }
      }
      val m = LinearModel(n, mRows, cost, lo, hi, rl, ru, entries.toArray,
        Array.fill(n)(VarKind.Continuous))
      val sol = BoundedSimplex.solve(m)
      if (sol.status == LpStatus.Optimal) {
        optimalSeen += 1
        checkKkt(m, sol, s"trial $trial")
      }
    }
    assert(optimalSeen > 10, s"only $optimalSeen optimal LPs in the random batch")
  }

  /** Primal feasibility + dual sign conventions + complementary slackness:
    * a complete optimality certificate for an LP claimed Optimal, entirely
    * independent of the pivoting path.
    */
  private def checkKkt(m: LinearModel, sol: LpSolution, ctx: String = ""): Unit = {
    val t = 1e-5
    assertFeasible(m, sol.x, ctx)
    val activity = rowActivity(m, sol.x)
    for (j <- 0 until m.nCols) {
      val v = sol.x(j); val rc = sol.reducedCost(j)
      val atLo = LinearModel.isFinite(m.colLower(j)) && v <= m.colLower(j) + t
      val atHi = LinearModel.isFinite(m.colUpper(j)) && v >= m.colUpper(j) - t
      if (!atLo && !atHi) assert(math.abs(rc) <= t, s"$ctx interior col $j rc=$rc")
      if (atLo && !atHi) assert(rc >= -t, s"$ctx col $j at lower, rc=$rc")
      if (atHi && !atLo) assert(rc <= t, s"$ctx col $j at upper, rc=$rc")
    }
    for (i <- 0 until m.nRows) {
      val s = activity(i); val d = sol.rowDual(i)
      val atLo = LinearModel.isFinite(m.rowLower(i)) && s <= m.rowLower(i) + t
      val atHi = LinearModel.isFinite(m.rowUpper(i)) && s >= m.rowUpper(i) - t
      if (!atLo && !atHi) assert(math.abs(d) <= t, s"$ctx interior row $i dual=$d")
      if (atLo && !atHi) assert(d >= -t, s"$ctx row $i at lower, dual=$d")
      if (atHi && !atLo) assert(d <= t, s"$ctx row $i at upper, dual=$d")
    }
    // rc = c - A'lambda must hold exactly (definitional identity).
    val atl = new Array[Double](m.nCols)
    for ((r, c, v) <- m.entries) atl(c) += sol.rowDual(r) * v
    for (j <- 0 until m.nCols)
      assert(math.abs(m.colCost(j) - atl(j) - sol.reducedCost(j)) <= t ||
        sol.reducedCost(j) == 0.0 && math.abs(m.colCost(j) - atl(j)) <= t,
        s"$ctx col $j rc identity")
  }

  private def rowActivity(m: LinearModel, x: Array[Double]): Array[Double] = {
    val act = new Array[Double](m.nRows)
    for ((r, c, v) <- m.entries) act(r) += v * x(c)
    act
  }

  private def assertFeasible(m: LinearModel, x: Array[Double], ctx: String = ""): Unit = {
    val t = 1e-5
    val act = rowActivity(m, x)
    for (j <- 0 until m.nCols) {
      if (LinearModel.isFinite(m.colLower(j))) assert(x(j) >= m.colLower(j) - t, s"$ctx col $j below lb")
      if (LinearModel.isFinite(m.colUpper(j))) assert(x(j) <= m.colUpper(j) + t, s"$ctx col $j above ub")
    }
    for (i <- 0 until m.nRows) {
      if (LinearModel.isFinite(m.rowLower(i))) assert(act(i) >= m.rowLower(i) - t, s"$ctx row $i below lb")
      if (LinearModel.isFinite(m.rowUpper(i))) assert(act(i) <= m.rowUpper(i) + t, s"$ctx row $i above ub")
    }
  }
}
