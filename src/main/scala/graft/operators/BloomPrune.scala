package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — the shuffle-reduction pattern for a big
  * fact⋈selective-dim join at 100 TB: build a bloom filter over the dim
  * side's join keys (a few MB regardless of fact size), broadcast it as a
  * literal into a fact-side FILTER evaluated during the scan, and only the
  * surviving ~(match + fpp) fraction of fact rows is shuffled into the real
  * join. The join itself still runs, so false positives are eliminated and
  * the final result is EXACTLY the plain join's — the filter only prunes.
  *
  * This is the manual, always-on form of Spark's own AQE runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which injects the
  * same `BloomFilterMightContain` expression when cost heuristics fire);
  * building it explicitly makes the pruning deterministic and usable when
  * the dim side is a computed DataFrame the optimizer can't see through.
  */
object BloomPrune {

  /** Serialized bloom filter over `keyCol` (long keys) of `keys`.
    * Runs one job over the (small) key set; `expectedItems`/`fpp` size the
    * filter — ~1.2 MB per million keys at 1% fpp.
    */
  def buildFilter(keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership test against a serialized filter — the same
    * Catalyst expression Spark's runtime row-level filtering injects.
    * `key` must be LONG.
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes), ColumnBridge.expression(key)))

  /** `fact` pre-filtered by a bloom filter on `dimKeys`' `dimKeyCol`, ready
    * to be joined exactly. Result rows ⊇ matching rows (fpp false
    * positives); compose with the real join for exact semantics.
    *
    * The key set is materialized to scratch parquet ONCE and reclaimed as
    * soon as the filter bytes are on the driver: sizing (count) and
    * building (bloomFilter) would otherwise run the dim plan twice — a
    * computed dim frame (the stated motivation for the manual path) would
    * pay double, and a dim that changes between the two jobs would yield a
    * mis-sized filter. Callers that already know the cardinality can skip
    * both jobs with the `expectedItems` overload.
    */
  def pruned(fact: DataFrame, factKeyCol: String,
      dimKeys: DataFrame, dimKeyCol: String, fpp: Double = 0.01): DataFrame = {
    val (keys, dir) = Scratch.materialize(dimKeys.select(dimKeyCol), "bloomkeys")
    val n = math.max(keys.count(), 1L)
    val bytes = buildFilter(keys, dimKeyCol, n, fpp)
    Scratch.delete(dimKeys.sparkSession, dir)
    fact.filter(mightContain(bytes, fact(factKeyCol)))
  }

  /** [[pruned]] with a caller-supplied cardinality: one pass over the dim
    * plan, no scratch write.
    */
  def pruned(fact: DataFrame, factKeyCol: String,
      dimKeys: DataFrame, dimKeyCol: String,
      expectedItems: Long, fpp: Double): DataFrame =
    fact.filter(mightContain(
      buildFilter(dimKeys, dimKeyCol, expectedItems, fpp), fact(factKeyCol)))
}
