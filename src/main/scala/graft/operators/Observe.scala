package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability: data-quality counters riding the SAME pass as
  * the transformation via Spark's `Observation` API — at 100 TB a separate
  * `count()` per quality metric is another full scan; observed metrics are
  * accumulated by the executors during whatever action the caller runs
  * next and cost nothing extra.
  *
  * Usage:
  * {{{
  *   val (docsObs, obs) = Observe.corpusQuality(docs)
  *   docsObs.write.parquet(out)          // any action
  *   val m = obs.get                      // rows, null_text, short_docs, …
  * }}}
  */
object Observe {

  /** Attach corpus-quality counters to `docs`: total rows, null/empty
    * text, short documents (< `shortBelow` tokens), and total tokens.
    * Returns the instrumented frame (same rows) and the Observation to
    * read after the next action completes.
    */
  def corpusQuality(docs: DataFrame, shortBelow: Int = 20,
      textCol: String = "text"): (DataFrame, Observation) = {
    val obs = Observation("graft_corpus_quality")
    val toks = size(split(coalesce(col(textCol), lit("")), " "))
    val instrumented = docs.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col(textCol).isNull || col(textCol) === "", 1L).otherwise(0L)).as("null_or_empty"),
      sum(when(toks < shortBelow, 1L).otherwise(0L)).as("short_docs"),
      sum(toks.cast("long")).as("total_tokens"))
    (instrumented, obs)
  }
}
