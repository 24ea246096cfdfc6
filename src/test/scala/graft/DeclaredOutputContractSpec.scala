package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Gate-parity tripwire for the DRIVER's correctness harness.
  *
  * The driver compares Spark output to the DuckDB oracle by loading both
  * into pandas, sorting columns by name, `sort_values` over every column,
  * then hashing. Two output shapes silently survive the local tuple-based
  * checker (tools/check_oracles.py pre-r15) but die or mismatch there:
  *
  *  1. ARRAY/MAP/STRUCT-typed output columns — pandas' lexsort raises
  *     `unhashable type: numpy.ndarray` (killed q83/q86/q89 in r14).
  *  2. DECIMAL-typed outputs — DuckDB DECIMAL/HUGEINT → pandas float64
  *     while Spark's parquet decimal128/int64 hashes differently even for
  *     identical values (q39/q61 history).
  *
  * This spec fails AT DECLARE TIME with a named error if any declared
  * query's output schema contains such a column: flatten arrays/maps to
  * delimited strings (`array_to_string`/`to_json`, identical text on both
  * engines) and cast decimal aggregates (`CAST(SUM(..) AS BIGINT)` /
  * `AS DOUBLE`) in the DECLARED statement; keep raw-collection semantics
  * pinned in scalatest specs instead.
  *
  * Only analysis runs here (`df.schema`) — no job execution for the final
  * select, so the whole 177-query surface checks in seconds (side-effect
  * statements inside a query's builder still execute, at test-SF cost).
  */
class DeclaredOutputContractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private def unhashable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _: DecimalType => true
    case _ => false
  }

  test("every declared query's output schema is driver-hashable") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sfDir).schema
          catch {
            case e: Throwable =>
              fail(s"declared query '$name' failed to build at $sfDir: $e")
          }
        val bad = schema.fields.filter(f => unhashable(f.dataType))
        if (bad.isEmpty) Nil
        else Seq(s"$name: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "DRIVER-UNHASHABLE OUTPUT: these declared queries emit ARRAY/MAP/" +
        "STRUCT/DECIMAL columns the driver's pandas hasher cannot compare.\n  " +
        offenders.mkString("\n  ") +
        "\nFlatten collections with array_to_string/to_json and cast " +
        "decimal aggregates in the DECLARED statement text (both engines); " +
        "pin raw-collection semantics in a scalatest spec instead.")
  }

  test("tripwire detects a deliberately-declared array-output query") {
    // The guard itself must fire on the shape that slipped through r14.
    val df = spark.sql("SELECT array(1, 2, 3) AS xs, map('a', 1) AS m")
    val bad = df.schema.fields.filter(f => unhashable(f.dataType))
    assert(bad.map(_.name).toSeq == Seq("xs", "m"))
  }
}
