package graft.solver

import graft.highs.Workloads

/** Test-side adapter for the reference's three LP/MIP scenarios (data lives
  * in graft.highs.Workloads, shared with the declared queries) plus
  * brute-force optima used as oracles by SolverSpec and the function specs.
  */
object ReferenceModels {
  val Inf: Double = Workloads.Inf

  type Var = Workloads.Var
  type Con = Workloads.Con
  type Coef = Workloads.Coef

  def build(vars: Seq[Var], cons: Seq[Con], coefs: Seq[Coef]): LinearModel = {
    val vIdx = vars.map(_._1).zipWithIndex.toMap
    val cIdx = cons.map(_._1).zipWithIndex.toMap
    LinearModel(
      nCols = vars.size,
      nRows = cons.size,
      colCost = vars.map(_._4).toArray,
      colLower = vars.map(_._2).toArray,
      colUpper = vars.map(_._3).toArray,
      rowLower = cons.map(_._2).toArray,
      rowUpper = cons.map(_._3).toArray,
      entries = coefs.map { case (c, v, x) => (cIdx(c), vIdx(v), x) }.toArray,
      kinds = vars.map(v => VarKind.fromString(v._5)).toArray
    )
  }

  val goldenVars: Seq[Var] = Workloads.goldenVars
  val goldenCons: Seq[Con] = Workloads.goldenCons
  val goldenCoefs: Seq[Coef] = Workloads.goldenCoefs
  def golden: LinearModel = build(goldenVars, goldenCons, goldenCoefs)

  val flowCosts: Map[(Int, Int), Double] = Workloads.flowCosts
  val teamA: Seq[Int] = Workloads.teamA
  val teamB: Seq[Int] = Workloads.teamB
  val tasks: Seq[Int] = Workloads.tasks
  val flowVars: Seq[Var] = Workloads.flowVars
  val flowCons: Seq[Con] = Workloads.flowCons
  val flowCoefs: Seq[Coef] = Workloads.flowCoefs
  def networkFlow: LinearModel = build(flowVars, flowCons, flowCoefs)

  /** Brute-force optimum of the assignment encoded by the flow model:
    * 4 tasks to distinct workers, at most 2 workers per team.
    */
  def bruteForceFlowCost: Double = {
    var best = Double.PositiveInfinity
    for {
      w7 <- 1 to 6; w8 <- 1 to 6; w9 <- 1 to 6; w10 <- 1 to 6
      ws = Seq(w7, w8, w9, w10)
      if ws.distinct.size == 4
      if ws.count(teamA.contains) <= 2 && ws.count(teamB.contains) <= 2
    } {
      val c = flowCosts((w7, 7)) + flowCosts((w8, 8)) + flowCosts((w9, 9)) + flowCosts((w10, 10))
      if (c < best) best = c
    }
    best
  }

  val dcConn: Map[(String, String), Double] = Workloads.dcConn
  val dcBuild: Map[String, Double] = Workloads.dcBuild
  val dcCap: Map[String, Double] = Workloads.dcCap
  val dcs: Seq[String] = Workloads.dcs
  val demands: Seq[String] = Workloads.demands
  val dcVars: Seq[Var] = Workloads.dcVars
  val dcCons: Seq[Con] = Workloads.dcCons
  val dcCoefs: Seq[Coef] = Workloads.dcCoefs
  def datacenter: LinearModel = build(dcVars, dcCons, dcCoefs)

  def bruteForceDatacenterCost: Double = {
    var best = Double.PositiveInfinity
    for {
      zMask <- 0 until 8
      z = dcs.zipWithIndex.map { case (d, i) => d -> ((zMask >> i) & 1) }.toMap
      nz = z.values.sum
      if nz >= 1 && nz <= 2
      a1 <- dcs; a2 <- dcs; a3 <- dcs; a4 <- dcs
      assign = Map("D1" -> a1, "D2" -> a2, "D3" -> a3, "D4" -> a4)
      if dcs.forall(i => demands.count(j => assign(j) == i) <= dcCap(i) * z(i))
    } {
      val c = demands.map(j => dcConn((assign(j), j))).sum +
        dcs.map(i => z(i) * dcBuild(i)).sum
      if (c < best) best = c
    }
    best
  }
}
