package graft.highs

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Named port of the third reference script, example_usage.sql
  * (/root/reference/example_usage.sql:13-93): the production_model LP built
  * statement-for-statement through the SQL TVF surface, the advanced-usage
  * CTAS tables (facility_location / portfolio / production_plan), and the
  * DROP TABLE cleanup.
  *
  * The script's prose "Expected Output" (x=0.6, y=3.2, obj 3.8 —
  * example_usage.sql:57-62) is mathematically wrong for the model it
  * builds: it MINIMIZES x + y with only upper-bounding constraints and
  * bounds x >= 0, y >= 1, so the optimum sits on the variable bounds at
  * x = 0, y = 1, objective 1.0 (the prose quotes the intersection point of
  * the two constraints, i.e. the MAXIMIZE solution; SURVEY.md §2A). We
  * assert the correct solution — the same one the reference's own
  * sqllogictest corpus pins for the identical model (test/sql/highs.test).
  */
class ExampleUsageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("example_usage.sql: production_model solves to x=0, y=1 (obj 1.0)") {
    ModelRegistry.remove("production_model")
    def q(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq

    // Steps 2-4 (example_usage.sql:20-37): the relational model tables.
    Seq("model_variables", "model_constraints", "model_coefficients")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql("""CREATE TABLE model_variables AS SELECT * FROM VALUES
        ('production_model', 'x', 0.0, 1e30, 1.0, 'continuous'),
        ('production_model', 'y', 1.0, 1e30, 1.0, 'continuous')
      AS v(model_name, variable_name, lower_bound, upper_bound, obj_coefficient, var_type)""")
    spark.sql("""CREATE TABLE model_constraints AS SELECT * FROM VALUES
        ('production_model', 'resource_limit', -1e30, 7.0),
        ('production_model', 'capacity_limit', -1e30, 9.0)
      AS c(model_name, constraint_name, lower_bound, upper_bound)""")
    spark.sql("""CREATE TABLE model_coefficients AS SELECT * FROM VALUES
        ('production_model', 'resource_limit', 'x', 1.0),
        ('production_model', 'resource_limit', 'y', 2.0),
        ('production_model', 'capacity_limit', 'x', 3.0),
        ('production_model', 'capacity_limit', 'y', 1.0)
      AS coef(model_name, constraint_name, variable_name, coefficient)""")

    // Steps 5-7 (example_usage.sql:41-52): build the model via the TVFs.
    q("SELECT * FROM highs_create_variables('production_model', 'x', 0.0, 1e30, 1.0, 'continuous')")
    q("SELECT * FROM highs_create_variables('production_model', 'y', 1.0, 1e30, 1.0, 'continuous')")
    q("SELECT * FROM highs_create_constraints('production_model', 'resource_limit', -1e30, 7.0)")
    q("SELECT * FROM highs_create_constraints('production_model', 'capacity_limit', -1e30, 9.0)")
    q("SELECT * FROM highs_set_coefficients('production_model', 'resource_limit', 'x', 1.0)")
    q("SELECT * FROM highs_set_coefficients('production_model', 'resource_limit', 'y', 2.0)")
    q("SELECT * FROM highs_set_coefficients('production_model', 'capacity_limit', 'x', 3.0)")
    q("SELECT * FROM highs_set_coefficients('production_model', 'capacity_limit', 'y', 1.0)")

    // Step 8 (example_usage.sql:55): the CORRECT optimum, not the prose's.
    assert(q("SELECT * FROM highs_solve('production_model') ORDER BY variable_name")
      == Seq(
        Row("x", "x_0", 0.0, 1.0, "Optimal"),
        Row("y", "y_1", 1.0, 1.0, "Optimal")))
    // Objective = 1*0 + 1*1 = 1.0, and both constraints are slack
    // (0 + 2*1 = 2 <= 7; 3*0 + 1 = 1 <= 9).
    val obj = spark.sql("""
      SELECT SUM(s.solution_value * v.obj_coefficient) AS obj
      FROM highs_solve('production_model') s
      JOIN model_variables v ON v.variable_name = s.variable_name""").collect()
    assert(obj.toSeq == Seq(Row(1.0)))
  }

  test("example_usage.sql: advanced-usage tables create and clean up") {
    // Examples 2-4 + cleanup (example_usage.sql:66-93).
    Seq("mip_variables", "portfolio_variables", "production_variables")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql("""CREATE TABLE mip_variables AS SELECT * FROM VALUES
        ('facility_location', 'facility_1', 0.0, 1.0, 100.0, 'binary'),
        ('facility_location', 'facility_2', 0.0, 1.0, 120.0, 'binary'),
        ('facility_location', 'capacity', 0.0, 1000.0, 0.5, 'continuous')
      AS v(model_name, variable_name, lower_bound, upper_bound, obj_coefficient, var_type)""")
    spark.sql("""CREATE TABLE portfolio_variables AS SELECT * FROM VALUES
        ('portfolio', 'stock_A', 0.0, 1.0, 0.08, 'continuous'),
        ('portfolio', 'stock_B', 0.0, 1.0, 0.12, 'continuous'),
        ('portfolio', 'stock_C', 0.0, 1.0, 0.06, 'continuous')
      AS v(model_name, variable_name, lower_bound, upper_bound, obj_coefficient, var_type)""")
    spark.sql("""CREATE TABLE production_variables AS SELECT * FROM VALUES
        ('production_plan', 'prod_t1', 0.0, 100.0, -10.0, 'continuous'),
        ('production_plan', 'prod_t2', 0.0, 100.0, -10.0, 'continuous'),
        ('production_plan', 'inv_t1', 0.0, 50.0, -2.0, 'continuous'),
        ('production_plan', 'inv_t2', 0.0, 50.0, -2.0, 'continuous')
      AS v(model_name, variable_name, lower_bound, upper_bound, obj_coefficient, var_type)""")
    assert(spark.table("mip_variables").count() == 3)
    assert(spark.table("portfolio_variables").count() == 3)
    assert(spark.table("production_variables").count() == 4)
    Seq("model_variables", "model_constraints", "model_coefficients",
        "mip_variables", "portfolio_variables", "production_variables")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    assert(!spark.catalog.tableExists("mip_variables"))
  }
}
