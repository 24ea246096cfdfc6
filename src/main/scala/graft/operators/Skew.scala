package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for hot keys, complementing AQE's runtime
  * skew-join splitting (enabled in Engine.session): when a handful of keys
  * carry most rows — the normal case for event types, languages, or
  * near-duplicate clusters at 100 TB — salting spreads each hot key over
  * `salt` reducers deterministically.
  */
object Skew {

  /** Deterministic salt in [0, salt) derived from the row's other columns
    * (never random — results must be reproducible across retries).
    */
  private def saltOf(cols: Seq[Column], salt: Int): Column =
    pmod(xxhash64(cols: _*), lit(salt.toLong)).cast("int")

  /** Two-phase skew-safe aggregation: partial per (key, salt), final per
    * key. Equivalent to groupBy(key).agg(count, sum) but no single reducer
    * ever sees a whole hot key.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val others = df.columns.filterNot(_ == keyCol).map(col).toSeq
    df.withColumn("_salt", saltOf(others, salt))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_n").as("n"), sum("_s").as("total"))
  }

  /** Skew-safe equi-join of a skewed large side against a small dimension:
    * the large side gets a deterministic salt, the dimension is replicated
    * `salt` times (explode of a literal range), and the join key becomes
    * (key, salt) — each hot key spreads over `salt` tasks.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCol: String,
      salt: Int = 16): DataFrame = {
    val others = large.columns.filterNot(_ == keyCol).map(col).toSeq
    val saltedLarge = large.withColumn("_salt", saltOf(others, salt))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(replicatedSmall, Seq(keyCol, "_salt")).drop("_salt")
  }
}
