package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** DuckDB-1.0-pinned string-similarity scalars (every expected value
  * below was read off the DuckDB oracle): character-SET jaccard,
  * equal-length hamming with DuckDB's error texts, Jaro with the
  * floored half-transposition count, the 0.7-threshold Winkler boost,
  * and FULL (unrestricted) Damerau-Levenshtein. Gate entry
  * q125_string_sim runs the identical statement on both engines.
  */
class StringSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def d(sql: String): Double = spark.sql(sql).head().getDouble(0)
  private def l(sql: String): Long = spark.sql(sql).head().getLong(0)

  test("jaccard is character-set based; empty arguments error") {
    assert(d("SELECT jaccard('abc','abd')") == 0.5)
    assert(d("SELECT jaccard('aab','ab')") == 1.0, "multiplicity ignored")
    val ex = intercept[Exception](spark.sql("SELECT jaccard('a','')").collect())
    assert(ex.getMessage.contains("An argument too short"), ex.getMessage)
    assert(spark.sql("SELECT jaccard('abc', NULL)").head().isNullAt(0))
  }

  test("hamming requires equal non-empty lengths") {
    assert(l("SELECT hamming('abc','abd')") == 1L)
    assert(l("SELECT mismatches('abc','abd')") == 1L, "DuckDB alias")
    val len = intercept[Exception](spark.sql("SELECT hamming('ab','abc')").collect())
    assert(len.getMessage.contains("equal length"), len.getMessage)
    val emp = intercept[Exception](spark.sql("SELECT hamming('','')").collect())
    assert(emp.getMessage.contains("length > 0"), emp.getMessage)
  }

  test("jaro matches DuckDB's floored half-transposition variant") {
    assert(math.abs(d("SELECT jaro_similarity('martha','marhta')")
      - 0.9444444444444445) < 1e-15)
    assert(math.abs(d("SELECT jaro_similarity('dwayne','duane')")
      - 0.8222222222222223) < 1e-15)
    // the odd-mismatch pair that exposed the flooring (DuckDB 0.69023,
    // textbook t/2.0 would read 0.68448)
    assert(math.abs(d(
      "SELECT jaro_similarity('agg line group hash vector fast column o'," +
        "'value key sort customer join agg row has')")
      - 0.6902298850574713) < 1e-15)
    assert(d("SELECT jaro_similarity('','')") == 0.0, "DuckDB's empty = 0")
    assert(d("SELECT jaro_similarity('abc','abc')") == 1.0)
  }

  test("winkler boost applies only above the 0.7 jaro threshold") {
    assert(math.abs(d("SELECT jaro_winkler_similarity('martha','marhta')")
      - 0.9611111111111111) < 1e-15)
    assert(math.abs(d("SELECT jaro_winkler_similarity('dwayne','duane')")
      - 0.8400000000000001) < 1e-15)
    // shared 3-char prefix but jaro 0.583 — no boost
    assert(d("SELECT jaro_winkler_similarity('abcdxxxx','abcyyyyy')") ==
      d("SELECT jaro_similarity('abcdxxxx','abcyyyyy')"))
  }

  test("damerau_levenshtein is the unrestricted variant") {
    assert(l("SELECT damerau_levenshtein('abc','acb')") == 1L)
    assert(l("SELECT damerau_levenshtein('ca','abc')") == 2L,
      "OSA would say 3; full Damerau transposes across the intermediate edit")
    assert(l("SELECT damerau_levenshtein('','abc')") == 3L)
    assert(l("SELECT damerau_levenshtein('abc','abc')") == 0L)
  }
}
