package graft.highs

import org.apache.spark.sql.SparkSession

/** The three LP/MIP scenarios shipped with the reference, as plain data.
  *
  *  - golden LP:    /root/reference/test/sql/highs.test:31-98
  *  - network flow: /root/reference/network_flow_example.sql:12-165
  *  - datacenter:   /root/reference/assignment_model_test.sql:25-124
  *
  * Shared by the engine's declared queries (graft.queries.HighsQueries) and
  * the solver test suite. Each model is a triple of row-seqs in the same
  * relational encoding the reference's SQL scripts use.
  */
object Workloads {
  val Inf = 1e30

  /** (name, lower, upper, objCoeff, varType) */
  type Var = (String, Double, Double, Double, String)
  /** (name, lower, upper) */
  type Con = (String, Double, Double)
  /** (conName, varName, coeff) */
  type Coef = (String, String, Double)

  /** Build a registry model through the public function surface, exactly as
    * the reference scripts do with repeated SELECT * FROM highs_create_*.
    * Clears any previous model of the same name first so declared queries
    * stay idempotent across repeated runs in one session.
    */
  def register(spark: SparkSession, model: String,
      vars: Seq[Var], cons: Seq[Con], coefs: Seq[Coef]): Unit = {
    ModelRegistry.remove(model)
    vars.foreach { case (n, lb, ub, obj, tpe) =>
      HighsFunctions.createVariables(spark, model, n, lb, ub, obj, tpe)
    }
    cons.foreach { case (n, lb, ub) =>
      HighsFunctions.createConstraints(spark, model, n, lb, ub)
    }
    coefs.foreach { case (c, v, x) =>
      HighsFunctions.setCoefficients(spark, model, c, v, x)
    }
  }

  // ---------------------------------------------------------------- golden
  /** highs.test: min x + y s.t. x + 2y <= 7, 3x + y <= 9, x >= 0, y >= 1. */
  val goldenVars: Seq[Var] = Seq(
    ("x", 0.0, Inf, 1.0, "continuous"),
    ("y", 1.0, Inf, 1.0, "continuous"))
  val goldenCons: Seq[Con] = Seq(("c1", -Inf, 7.0), ("c2", -Inf, 9.0))
  val goldenCoefs: Seq[Coef] = Seq(
    ("c1", "x", 1.0), ("c1", "y", 2.0), ("c2", "x", 3.0), ("c2", "y", 1.0))

  // ----------------------------------------------------------- network flow
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

  // ------------------------------------------------------------- datacenter
  /** assignment_model_test.sql: binary facility location. Unique optimum:
    * build DC1+DC3, D1,D2->DC1, D3,D4->DC3, total cost 260 (brute-forced in
    * SolverSpec).
    */
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
}
