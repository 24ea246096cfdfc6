package graft.solver

/** The three LP/MIP scenarios shipped with the reference, as plain data,
  * shared by the solver spec and the HiGHS-parity function spec.
  *
  *  - golden LP:    /root/reference/test/sql/highs.test:31-98
  *  - network flow: /root/reference/network_flow_example.sql:12-165
  *  - datacenter:   /root/reference/assignment_model_test.sql:25-124
  */
object ReferenceModels {
  val Inf = 1e30

  // (name, lower, upper, objCoeff, varType)
  type Var = (String, Double, Double, Double, String)
  // (name, lower, upper)
  type Con = (String, Double, Double)
  // (conName, varName, coeff)
  type Coef = (String, String, Double)

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

  /** highs.test: min x + y s.t. x + 2y <= 7, 3x + y <= 9, x >= 0, y >= 1. */
  val goldenVars: Seq[Var] = Seq(
    ("x", 0.0, Inf, 1.0, "continuous"),
    ("y", 1.0, Inf, 1.0, "continuous"))
  val goldenCons: Seq[Con] = Seq(("c1", -Inf, 7.0), ("c2", -Inf, 9.0))
  val goldenCoefs: Seq[Coef] = Seq(
    ("c1", "x", 1.0), ("c1", "y", 2.0), ("c2", "x", 3.0), ("c2", "y", 1.0))
  def golden: LinearModel = build(goldenVars, goldenCons, goldenCoefs)

  /** network_flow_example.sql: min-cost-flow assignment. 4 units of flow,
    * source -> 2 teams (cap 2) -> 6 workers -> 4 tasks -> sink.
    */
  val flowCosts: Map[(Int, Int), Double] = Map(
    (1, 7) -> 90, (1, 8) -> 76, (1, 9) -> 75, (1, 10) -> 70,
    (2, 7) -> 35, (2, 8) -> 85, (2, 9) -> 55, (2, 10) -> 65,
    (3, 7) -> 125, (3, 8) -> 95, (3, 9) -> 90, (3, 10) -> 105,
    (4, 7) -> 45, (4, 8) -> 110, (4, 9) -> 95, (4, 10) -> 115,
    (5, 7) -> 60, (5, 8) -> 105, (5, 9) -> 80, (5, 10) -> 75,
    (6, 7) -> 45, (6, 8) -> 65, (6, 9) -> 110, (6, 10) -> 95)
  val teamA = Seq(1, 3, 5)
  val teamB = Seq(2, 4, 6)
  val tasks = Seq(7, 8, 9, 10)

  val flowVars: Seq[Var] = {
    val src = Seq(("x_0_11", 0.0, 2.0, 0.0, "continuous"),
      ("x_0_12", 0.0, 2.0, 0.0, "continuous"))
    val toWorkers = teamA.map(w => (s"x_11_$w", 0.0, 1.0, 0.0, "continuous")) ++
      teamB.map(w => (s"x_12_$w", 0.0, 1.0, 0.0, "continuous"))
    val workerTask = for {
      w <- 1 to 6; t <- tasks
    } yield (s"x_${w}_$t", 0.0, 1.0, flowCosts((w, t)), "continuous")
    val toSink = tasks.map(t => (s"x_${t}_13", 0.0, 1.0, 0.0, "continuous"))
    src ++ toWorkers ++ workerTask ++ toSink
  }
  val flowCons: Seq[Con] =
    Seq(("source_flow", 4.0, 4.0), ("team_a_flow", 0.0, 0.0), ("team_b_flow", 0.0, 0.0)) ++
      (1 to 6).map(w => (s"worker_${w}_flow", 0.0, 0.0)) ++
      tasks.map(t => (s"task_${t}_flow", 0.0, 0.0)) :+ ("sink_flow", 4.0, 4.0)
  val flowCoefs: Seq[Coef] = {
    val src = Seq(("source_flow", "x_0_11", 1.0), ("source_flow", "x_0_12", 1.0))
    val tA = ("team_a_flow", "x_0_11", 1.0) +: teamA.map(w => ("team_a_flow", s"x_11_$w", -1.0))
    val tB = ("team_b_flow", "x_0_12", 1.0) +: teamB.map(w => ("team_b_flow", s"x_12_$w", -1.0))
    val workers = (1 to 6).flatMap { w =>
      val in = if (teamA.contains(w)) s"x_11_$w" else s"x_12_$w"
      (s"worker_${w}_flow", in, 1.0) +: tasks.map(t => (s"worker_${w}_flow", s"x_${w}_$t", -1.0))
    }
    val taskCons = tasks.flatMap { t =>
      (1 to 6).map(w => (s"task_${t}_flow", s"x_${w}_$t", 1.0)) :+ (s"task_${t}_flow", s"x_${t}_13", -1.0)
    }
    val sink = tasks.map(t => ("sink_flow", s"x_${t}_13", 1.0))
    src ++ tA ++ tB ++ workers ++ taskCons ++ sink
  }
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

  /** assignment_model_test.sql: binary facility location. */
  val dcConn: Map[(String, String), Double] = Map(
    ("DC1", "D1") -> 10, ("DC1", "D2") -> 15, ("DC1", "D3") -> 20, ("DC1", "D4") -> 25,
    ("DC2", "D1") -> 20, ("DC2", "D2") -> 10, ("DC2", "D3") -> 15, ("DC2", "D4") -> 30,
    ("DC3", "D1") -> 25, ("DC3", "D2") -> 20, ("DC3", "D3") -> 10, ("DC3", "D4") -> 15)
  val dcBuild: Map[String, Double] = Map("DC1" -> 100, "DC2" -> 120, "DC3" -> 110)
  val dcCap: Map[String, Double] = Map("DC1" -> 3, "DC2" -> 2, "DC3" -> 3)
  val dcs = Seq("DC1", "DC2", "DC3")
  val demands = Seq("D1", "D2", "D3", "D4")

  val dcVars: Seq[Var] =
    (for { i <- dcs; j <- demands } yield (s"x_${i}_$j", 0.0, 1.0, dcConn((i, j)), "binary")) ++
      dcs.map(i => (s"z_$i", 0.0, 1.0, dcBuild(i), "binary"))
  val dcCons: Seq[Con] =
    demands.map(j => (s"demand_$j", 1.0, 1.0)) ++
      dcs.map(i => (s"capacity_$i", -Inf, 0.0)) ++
      Seq(("min_datacenters", 1.0, Inf), ("max_datacenters", -Inf, 2.0))
  val dcCoefs: Seq[Coef] =
    demands.flatMap(j => dcs.map(i => (s"demand_$j", s"x_${i}_$j", 1.0))) ++
      dcs.flatMap(i => demands.map(j => (s"capacity_$i", s"x_${i}_$j", 1.0)) :+
        (s"capacity_$i", s"z_$i", -dcCap(i))) ++
      dcs.map(i => ("min_datacenters", s"z_$i", 1.0)) ++
      dcs.map(i => ("max_datacenters", s"z_$i", 1.0))
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
