package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine
import graft.highs.{HighsFunctions, ModelRegistry, Workloads}

/** Declared queries for the reference's own six functions (SURVEY.md §2A)
  * and its two end-to-end workloads (network_flow_example.sql,
  * assignment_model_test.sql).
  *
  * Every query is self-contained and idempotent: models are (re)built
  * through the public function surface on each invocation, exactly as the
  * reference scripts replay their SELECT * FROM highs_create_* statements.
  *
  * Oracle side: the solver surface is not expressible in stock DuckDB (the
  * oracle has no HiGHS extension), so oracles are constant relations pinning
  * the golden rows — the same rows the reference's sqllogictest pins
  * (test/sql/highs.test:55-98). Optimality of the pinned workload rows is
  * proven separately by brute force in SolverSpec/WorkloadSpec.
  */
object HighsQueries {

  /** Stable prefix of the openssl version string (the suffix embeds the
    * running JVM's version, which the oracle cannot know).
    */
  val opensslPrefix: String =
    s"Hello Michael, HiGHS version: ${HighsFunctions.SolverVersion}, OpenSSL version: OpenSSL"

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  // ------------------------------------------------------------ §2A queries

  private def qVersion(spark: SparkSession, sfDir: String): DataFrame = {
    HighsFunctions.registerScalars(spark)
    spark.sql("SELECT highs_version('Sam') AS result")
  }

  private def qOpensslVersion(spark: SparkSession, sfDir: String): DataFrame = {
    HighsFunctions.registerScalars(spark)
    spark.sql(
      s"SELECT substring(highs_openssl_version('Michael'), 1, ${opensslPrefix.length}) AS result")
  }

  private def qCreateVariables(spark: SparkSession, sfDir: String): DataFrame = {
    ModelRegistry.remove("m_cv")
    val a = HighsFunctions.createVariables(spark, "m_cv", "x", 0.0, Workloads.Inf, 1.0, "continuous")
    val b = HighsFunctions.createVariables(spark, "m_cv", "y", 1.0, Workloads.Inf, 1.0, "continuous")
    val dup = HighsFunctions.createVariables(spark, "m_cv", "x", 0.0, 1.0, 0.0, "continuous")
    a.union(b).union(dup).orderBy("variable_index")
  }

  private def qCreateConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    ModelRegistry.remove("m_cc")
    val a = HighsFunctions.createConstraints(spark, "m_cc", "c1", -Workloads.Inf, 7.0)
    val b = HighsFunctions.createConstraints(spark, "m_cc", "c2", -Workloads.Inf, 9.0)
    val dup = HighsFunctions.createConstraints(spark, "m_cc", "c1", 0.0, 0.0)
    a.union(b).union(dup).orderBy("constraint_index")
  }

  private def qSetCoefficients(spark: SparkSession, sfDir: String): DataFrame = {
    ModelRegistry.remove("m_sc")
    HighsFunctions.createVariables(spark, "m_sc", "x", 0.0, 1.0, 1.0, "continuous")
    HighsFunctions.createConstraints(spark, "m_sc", "c1", -Workloads.Inf, 7.0)
    val ok = HighsFunctions.setCoefficients(spark, "m_sc", "c1", "x", 1.0)
    val badVar = HighsFunctions.setCoefficients(spark, "m_sc", "c1", "zz", 2.0)
    val badModel = HighsFunctions.setCoefficients(spark, "no_such_model", "c1", "x", 3.0)
    ok.union(badVar).union(badModel).orderBy("coefficient")
  }

  private def qSolveGolden(spark: SparkSession, sfDir: String): DataFrame = {
    Workloads.register(spark, "model1",
      Workloads.goldenVars, Workloads.goldenCons, Workloads.goldenCoefs)
    HighsFunctions.solve(spark, "model1").orderBy("variable_name")
  }

  private def qSolveMissing(spark: SparkSession, sfDir: String): DataFrame =
    HighsFunctions.solve(spark, "model_that_does_not_exist")

  private def qSolveMip(spark: SparkSession, sfDir: String): DataFrame = {
    Workloads.register(spark, "datacenter_model",
      Workloads.dcVars, Workloads.dcCons, Workloads.dcCoefs)
    HighsFunctions.solve(spark, "datacenter_model").orderBy("variable_name")
  }

  private def qSolveFlow(spark: SparkSession, sfDir: String): DataFrame = {
    Workloads.register(spark, "assignment_model",
      Workloads.flowVars, Workloads.flowCons, Workloads.flowCoefs)
    HighsFunctions.solve(spark, "assignment_model").orderBy("variable_name")
  }

  /** The distributed many-model path: three independent LPs encoded
    * relationally, shuffled once on model_name, solved per-group on
    * executors (HighsFunctions.solveMany).
    */
  private def qSolveMany(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val variables = Seq(
      ("ma", "x", 0.0, Workloads.Inf, 1.0, "continuous"),
      ("ma", "y", 1.0, Workloads.Inf, 1.0, "continuous"),
      ("mb", "w", 2.0, 10.0, 1.0, "continuous"),
      ("mc", "a", 0.0, Workloads.Inf, 1.0, "continuous"),
      ("mc", "b", 0.0, Workloads.Inf, 2.0, "continuous")
    ).toDF("model_name", "variable_name", "lower_bound", "upper_bound",
      "obj_coefficient", "var_type")
    val constraints = Seq(
      ("ma", "c1", -Workloads.Inf, 7.0),
      ("ma", "c2", -Workloads.Inf, 9.0),
      ("mb", "c1", -Workloads.Inf, 10.0),
      ("mc", "c1", 4.0, 4.0)
    ).toDF("model_name", "constraint_name", "lower_bound", "upper_bound")
    val coefficients = Seq(
      ("ma", "c1", "x", 1.0), ("ma", "c1", "y", 2.0),
      ("ma", "c2", "x", 3.0), ("ma", "c2", "y", 1.0),
      ("mb", "c1", "w", 1.0),
      ("mc", "c1", "a", 1.0), ("mc", "c1", "b", 1.0)
    ).toDF("model_name", "constraint_name", "variable_name", "coefficient")
    HighsFunctions.solveMany(spark, variables, constraints, coefficients)
      .toDF().orderBy("model_name", "variable_name")
  }

  // ------------------------------------------------- reference workloads

  /** The golden scenario again, driven ENTIRELY through the SQL TVF surface
    * (SparkSessionExtensions-registered table functions) — the reference's
    * user-facing contract, statement for statement
    * (test/sql/highs.test:55-98). Requires the GraftSparkExtensions config
    * on the session (Verify/Bench/Engine all set it).
    */
  private def qSolveSql(spark: SparkSession, sfDir: String): DataFrame = {
    ModelRegistry.remove("model_sql")
    Seq(
      "SELECT * FROM highs_create_variables('model_sql', 'x', 0.0, 1e30, 1.0, 'continuous')",
      "SELECT * FROM highs_create_variables('model_sql', 'y', 1.0, 1e30, 1.0, 'continuous')",
      "SELECT * FROM highs_create_constraints('model_sql', 'c1', -1e30, 7.0)",
      "SELECT * FROM highs_create_constraints('model_sql', 'c2', -1e30, 9.0)",
      "SELECT * FROM highs_set_coefficients('model_sql', 'c1', 'x', 1.0)",
      "SELECT * FROM highs_set_coefficients('model_sql', 'c1', 'y', 2.0)",
      "SELECT * FROM highs_set_coefficients('model_sql', 'c2', 'x', 3.0)",
      "SELECT * FROM highs_set_coefficients('model_sql', 'c2', 'y', 1.0)"
    ).foreach(spark.sql(_).collect())
    spark.sql("SELECT * FROM highs_solve('model_sql') ORDER BY variable_name")
  }

  /** network_flow_example.sql:168-215 — solve, then the reference's exact
    * downstream SQL (CTE -> LIKE/NOT LIKE filter -> CASE cost mapping ->
    * SUM -> '||' -> CAST).
    */
  private def qNetworkFlowTotal(spark: SparkSession, sfDir: String): DataFrame = {
    qSolveFlow(spark, sfDir).createOrReplaceTempView("nf_solution")
    val caseArms = Workloads.flowCosts.toSeq.sortBy(_._1)
      .map { case ((w, t), c) => s"WHEN 'x_${w}_$t' THEN ${c} * solution_value" }
      .mkString("\n      ")
    spark.sql(s"""
      WITH cost_vars AS (
        SELECT variable_name, solution_value
        FROM nf_solution
        WHERE solution_value > 0
          AND variable_name LIKE 'x!_%!_%' ESCAPE '!'
          AND variable_name NOT LIKE 'x!_0!_%' ESCAPE '!'
          AND variable_name NOT LIKE 'x!_%!_13' ESCAPE '!'
          AND variable_name NOT LIKE 'x!_11!_%' ESCAPE '!'
          AND variable_name NOT LIKE 'x!_12!_%' ESCAPE '!'
      ),
      cost_calculation AS (
        SELECT CASE variable_name
          $caseArms
          ELSE 0 END AS cost_contribution
        FROM cost_vars
      )
      SELECT 'Total cost = ' || CAST(SUM(cost_contribution) AS INT) AS result
      FROM cost_calculation""")
  }

  /** network_flow_example.sql:218-264 — worker/task assignment listing via
    * SPLIT_PART + IN + CASE + '||', ordered by worker.
    */
  private def qNetworkFlowAssignments(spark: SparkSession, sfDir: String): DataFrame = {
    qSolveFlow(spark, sfDir).createOrReplaceTempView("nf_solution")
    val caseArms = Workloads.flowCosts.toSeq.sortBy(_._1)
      .map { case ((w, t), c) => s"WHEN 'x_${w}_$t' THEN ${c.toInt}" }
      .mkString("\n      ")
    spark.sql(s"""
      WITH assignments AS (
        SELECT
          SPLIT_PART(variable_name, '_', 2) AS worker,
          SPLIT_PART(variable_name, '_', 3) AS task,
          CASE variable_name
            $caseArms
            ELSE 0 END AS cost,
          solution_value
        FROM nf_solution
        WHERE solution_value > 0
          AND SPLIT_PART(variable_name, '_', 2) IN ('1','2','3','4','5','6')
          AND SPLIT_PART(variable_name, '_', 3) IN ('7','8','9','10')
      )
      SELECT 'Worker ' || worker || ' assigned to task ' || task ||
             '.  Cost = ' || CAST(cost AS INT) AS assignment
      FROM assignments
      WHERE solution_value > 0
      ORDER BY CAST(worker AS INT)""")
  }

  /** assignment_model_test.sql:124 — the solved facility location, reduced
    * to the chosen (nonzero) variables. Unique optimum (SolverSpec brute
    * force): build DC1+DC3, D1,D2->DC1, D3,D4->DC3, total 260.
    */
  private def qDatacenterAssignment(spark: SparkSession, sfDir: String): DataFrame = {
    qSolveMip(spark, sfDir).createOrReplaceTempView("dc_solution")
    spark.sql("""
      SELECT variable_name, solution_value
      FROM dc_solution
      WHERE solution_value > 0
      ORDER BY variable_name""")
  }

  /** Batch solve at real scale: one LP PER PART ROW read from parquet
    * (500 models at sf0.01 — not inline literals), encoded relationally,
    * shuffled once on model_name, solved per-group on executors
    * (HighsFunctions.solveMany). Each model is
    *   minimize -x - 2y   s.t.  x + y <= sz + s2,  0 <= x <= sz, 0 <= y <= s2
    * with sz = p_size, s2 = p_partkey % 10 + 1 — the unique optimum sits at
    * the upper bounds (x = sz, y = s2), a closed form the DuckDB oracle
    * computes directly. variable_index is part of the output: it proves the
    * lexicographic-name index contract holds under real partitioning.
    * reduced_cost is excluded (the binding constraint leaves a dual
    * degeneracy where multiple optimal bases disagree on it).
    */
  private def qSolveBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Engine.table(spark, sfDir, "part")
      .filter(col("p_partkey") <= 500)
      .select(concat(lit("m"), col("p_partkey").cast("string")).as("model_name"),
        col("p_size").cast("double").as("sz"),
        ((col("p_partkey") % 10) + 1).cast("double").as("s2"))
    val variables = p.select(col("model_name"), lit("x").as("variable_name"),
        lit(0.0).as("lower_bound"), col("sz").as("upper_bound"),
        lit(-1.0).as("obj_coefficient"), lit("continuous").as("var_type"))
      .union(p.select(col("model_name"), lit("y"), lit(0.0), col("s2"),
        lit(-2.0), lit("continuous")))
    val constraints = p.select(col("model_name"), lit("c").as("constraint_name"),
      lit(-Workloads.Inf).as("lower_bound"), (col("sz") + col("s2")).as("upper_bound"))
    val coefficients = p.select(col("model_name"), lit("c").as("constraint_name"),
        lit("x").as("variable_name"), lit(1.0).as("coefficient"))
      .union(p.select(col("model_name"), lit("c"), lit("y"), lit(1.0)))
    HighsFunctions.solveMany(spark, variables, constraints, coefficients)
      .toDF()
      .select("model_name", "variable_name", "variable_index", "solution_value", "status")
      .orderBy("model_name", "variable_name")
  }

  // ---------------------------------------------------------------- export

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "highs_version" -> (qVersion _),
    "highs_openssl_version" -> (qOpensslVersion _),
    "highs_create_variables" -> (qCreateVariables _),
    "highs_create_constraints" -> (qCreateConstraints _),
    "highs_set_coefficients" -> (qSetCoefficients _),
    "highs_solve" -> (qSolveGolden _),
    "highs_solve_sql" -> (qSolveSql _),
    "highs_solve_missing" -> (qSolveMissing _),
    "highs_solve_mip" -> (qSolveMip _),
    "highs_solve_flow" -> (qSolveFlow _),
    "highs_solve_many" -> (qSolveMany _),
    "highs_solve_batch" -> (qSolveBatch _),
    "network_flow_total" -> (qNetworkFlowTotal _),
    "network_flow_assignments" -> (qNetworkFlowAssignments _),
    "datacenter_assignment" -> (qDatacenterAssignment _)
  )

  private val D = "AS DOUBLE"

  /** Constant-relation oracles (see class scaladoc). DuckDB bare decimal
    * literals are DECIMAL, so every double column is CAST explicitly.
    */
  val oracles: Map[String, String] = Map(
    "highs_version" ->
      s"SELECT ${sqlLit(HighsFunctions.versionString("Sam"))} AS result",
    "highs_openssl_version" ->
      s"SELECT ${sqlLit(opensslPrefix)} AS result",
    "highs_create_variables" -> """
      SELECT variable_name, variable_index, status FROM (VALUES
        ('x', 'x_0', 'SUCCESS'),
        ('y', 'y_1', 'SUCCESS'),
        ('x', 'ERROR', 'ERROR: Variable ''x'' already exists in model ''m_cv''')
      ) AS t(variable_name, variable_index, status) ORDER BY variable_index""",
    "highs_create_constraints" -> """
      SELECT constraint_name, constraint_index, status FROM (VALUES
        ('c1', 'c1_0', 'SUCCESS'),
        ('c2', 'c2_1', 'SUCCESS'),
        ('c1', 'ERROR', 'ERROR: Constraint ''c1'' already exists in model ''m_cc''')
      ) AS t(constraint_name, constraint_index, status) ORDER BY constraint_index""",
    "highs_set_coefficients" -> s"""
      SELECT constraint_name, variable_name, CAST(coefficient $D) AS coefficient, status FROM (VALUES
        ('c1', 'x', 1.0, 'SUCCESS'),
        ('c1', 'zz', 2.0, 'ERROR: Variable ''zz'' not found in model ''m_sc'''),
        ('c1', 'x', 3.0, 'ERROR: Model ''no_such_model'' not found')
      ) AS t(constraint_name, variable_name, coefficient, status) ORDER BY coefficient""",
    "highs_solve" -> s"""
      SELECT variable_name, variable_index, CAST(solution_value $D) AS solution_value,
             CAST(reduced_cost $D) AS reduced_cost, status FROM (VALUES
        ('x', 'x_0', 0.0, 1.0, 'Optimal'),
        ('y', 'y_1', 1.0, 1.0, 'Optimal')
      ) AS t(variable_name, variable_index, solution_value, reduced_cost, status)
      ORDER BY variable_name""",
    "highs_solve_sql" -> s"""
      SELECT variable_name, variable_index, CAST(solution_value $D) AS solution_value,
             CAST(reduced_cost $D) AS reduced_cost, status FROM (VALUES
        ('x', 'x_0', 0.0, 1.0, 'Optimal'),
        ('y', 'y_1', 1.0, 1.0, 'Optimal')
      ) AS t(variable_name, variable_index, solution_value, reduced_cost, status)
      ORDER BY variable_name""",
    "highs_solve_missing" -> s"""
      SELECT 'N/A' AS variable_name, 'ERROR' AS variable_index,
             CAST(0.0 $D) AS solution_value, CAST(0.0 $D) AS reduced_cost,
             'ERROR: Model ''model_that_does_not_exist'' not found' AS status""",
    "highs_solve_mip" -> s"""
      SELECT variable_name, variable_index, CAST(solution_value $D) AS solution_value,
             CAST(reduced_cost $D) AS reduced_cost, status FROM (VALUES
        ('x_DC1_D1', 'x_DC1_D1_0', 1.0, 0.0, 'Optimal'),
        ('x_DC1_D2', 'x_DC1_D2_1', 1.0, 0.0, 'Optimal'),
        ('x_DC1_D3', 'x_DC1_D3_2', 0.0, 0.0, 'Optimal'),
        ('x_DC1_D4', 'x_DC1_D4_3', 0.0, 0.0, 'Optimal'),
        ('x_DC2_D1', 'x_DC2_D1_4', 0.0, 0.0, 'Optimal'),
        ('x_DC2_D2', 'x_DC2_D2_5', 0.0, 0.0, 'Optimal'),
        ('x_DC2_D3', 'x_DC2_D3_6', 0.0, 0.0, 'Optimal'),
        ('x_DC2_D4', 'x_DC2_D4_7', 0.0, 0.0, 'Optimal'),
        ('x_DC3_D1', 'x_DC3_D1_8', 0.0, 0.0, 'Optimal'),
        ('x_DC3_D2', 'x_DC3_D2_9', 0.0, 0.0, 'Optimal'),
        ('x_DC3_D3', 'x_DC3_D3_10', 1.0, 0.0, 'Optimal'),
        ('x_DC3_D4', 'x_DC3_D4_11', 1.0, 0.0, 'Optimal'),
        ('z_DC1', 'z_DC1_12', 1.0, 0.0, 'Optimal'),
        ('z_DC2', 'z_DC2_13', 0.0, 0.0, 'Optimal'),
        ('z_DC3', 'z_DC3_14', 1.0, 0.0, 'Optimal')
      ) AS t(variable_name, variable_index, solution_value, reduced_cost, status)
      ORDER BY variable_name""",
    "network_flow_total" -> "SELECT 'Total cost = 250' AS result",
    "datacenter_assignment" -> s"""
      SELECT variable_name, CAST(solution_value $D) AS solution_value FROM (VALUES
        ('x_DC1_D1', 1.0), ('x_DC1_D2', 1.0), ('x_DC3_D3', 1.0),
        ('x_DC3_D4', 1.0), ('z_DC1', 1.0), ('z_DC3', 1.0)
      ) AS t(variable_name, solution_value) ORDER BY variable_name""",
    // The batch models have a closed-form unique optimum (both variables at
    // their upper bounds), so this oracle is COMPUTED from part, not pinned.
    "highs_solve_batch" -> s"""
      WITH p AS (SELECT 'm' || CAST(p_partkey AS VARCHAR) AS model_name,
                        CAST(p_size $D) AS sz,
                        CAST(p_partkey % 10 + 1 $D) AS s2
                 FROM part WHERE p_partkey <= 500)
      SELECT model_name, variable_name, variable_index,
             CAST(solution_value $D) AS solution_value, status FROM (
        SELECT model_name, 'x' AS variable_name, 'x_0' AS variable_index,
               sz AS solution_value, 'Optimal' AS status FROM p
        UNION ALL
        SELECT model_name, 'y', 'y_1', s2, 'Optimal' FROM p
      ) ORDER BY model_name, variable_name"""
    // highs_solve_flow, highs_solve_many, network_flow_assignments oracles
    // are appended by OracleGolden (values pinned from the deterministic
    // solver output, optimality brute-force-proven in the specs).
  ) ++ OracleGolden.pinned

  /** Oracles whose row values are pinned from the deterministic solver's
    * verified output. The simplex/B&B pivoting is pure deterministic float
    * arithmetic, so the chosen vertex is stable across runs; SolverSpec
    * proves by brute force that the pinned flow assignment achieves the
    * optimal cost 250 (the LP has 3 alternate optima — the totals are
    * forced, the chosen vertex is our solver's).
    */
  private object OracleGolden {
    private val D = "AS DOUBLE"

    private val flowRows: Seq[(String, Int, Double, Double)] = Seq(
      ("x_0_11", 0, 2.0, 0.0), ("x_0_12", 1, 2.0, -16.0),
      ("x_10_13", 35, 1.0, -6.0), ("x_11_1", 2, 1.0, -5.0),
      ("x_11_3", 3, 0.0, 10.0), ("x_11_5", 4, 1.0, 0.0),
      ("x_12_2", 5, 1.0, -9.0), ("x_12_4", 6, 0.0, 0.0),
      ("x_12_6", 7, 1.0, 0.0), ("x_1_10", 11, 1.0, 0.0),
      ("x_1_7", 8, 0.0, 35.0), ("x_1_8", 9, 0.0, 0.0),
      ("x_1_9", 10, 0.0, 0.0), ("x_2_10", 15, 0.0, 15.0),
      ("x_2_7", 12, 0.0, 0.0), ("x_2_8", 13, 0.0, 29.0),
      ("x_2_9", 14, 1.0, 0.0), ("x_3_10", 19, 0.0, 20.0),
      ("x_3_7", 16, 0.0, 55.0), ("x_3_8", 17, 0.0, 4.0),
      ("x_3_9", 18, 0.0, 0.0), ("x_4_10", 23, 0.0, 56.0),
      ("x_4_7", 20, 0.0, 1.0), ("x_4_8", 21, 0.0, 45.0),
      ("x_4_9", 22, 0.0, 31.0), ("x_5_10", 27, 0.0, 0.0),
      ("x_5_7", 24, 1.0, 0.0), ("x_5_8", 25, 0.0, 24.0),
      ("x_5_9", 26, 0.0, 0.0), ("x_6_10", 31, 0.0, 36.0),
      ("x_6_7", 28, 0.0, 1.0), ("x_6_8", 29, 1.0, 0.0),
      ("x_6_9", 30, 0.0, 46.0), ("x_7_13", 32, 1.0, -21.0),
      ("x_8_13", 33, 1.0, 0.0), ("x_9_13", 34, 1.0, -1.0))

    private val flowValues = flowRows
      .map { case (n, i, v, rc) => s"('$n', '${n}_$i', $v, $rc, 'Optimal')" }
      .mkString(",\n        ")

    val pinned: Map[String, String] = Map(
      "highs_solve_flow" -> s"""
        SELECT variable_name, variable_index, CAST(solution_value $D) AS solution_value,
               CAST(reduced_cost $D) AS reduced_cost, status FROM (VALUES
          $flowValues
        ) AS t(variable_name, variable_index, solution_value, reduced_cost, status)
        ORDER BY variable_name""",
      "highs_solve_many" -> s"""
        SELECT model_name, variable_name, variable_index,
               CAST(solution_value $D) AS solution_value,
               CAST(reduced_cost $D) AS reduced_cost, status FROM (VALUES
          ('ma', 'x', 'x_0', 0.0, 1.0, 'Optimal'),
          ('ma', 'y', 'y_1', 1.0, 1.0, 'Optimal'),
          ('mb', 'w', 'w_0', 2.0, 1.0, 'Optimal'),
          ('mc', 'a', 'a_0', 4.0, 0.0, 'Optimal'),
          ('mc', 'b', 'b_1', 0.0, 1.0, 'Optimal')
        ) AS t(model_name, variable_name, variable_index, solution_value, reduced_cost, status)
        ORDER BY model_name, variable_name""",
      "network_flow_assignments" -> """
        SELECT assignment FROM (VALUES
          ('Worker 1 assigned to task 10.  Cost = 70'),
          ('Worker 2 assigned to task 9.  Cost = 55'),
          ('Worker 5 assigned to task 7.  Cost = 60'),
          ('Worker 6 assigned to task 8.  Cost = 65')
        ) AS t(assignment) ORDER BY assignment"""
    )
  }
}
