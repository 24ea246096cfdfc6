package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring span dedup by SUFFIX-KEY SORT — the sharper sibling of
  * [[TextAnalysis.spanDupStats]]'s inverted-index formulation, and the
  * plan shape of the method's source (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better": their ExactSubstr
  * deduplicator builds a suffix array — i.e. SORTS suffixes — and scans
  * neighbors for long shared prefixes; public paper).
  *
  * Semantics: a token position is duplicated iff it lies inside a
  * `minLen`-token window that also occurs in at least one OTHER document;
  * output is each document's MAXIMAL contiguous duplicated runs, which
  * recovers duplicated spans of ANY length >= minLen without per-length
  * passes (a 31-token copied passage reports as one 31-token span, not
  * seventeen 15-grams).
  *
  * Why a sort when [[TextAnalysis]] already has the index join: the
  * inverted index shuffles every gram TWICE (distinct + count, then the
  * semi-join back), while the sort form shuffles each suffix key ONCE
  * into range partitions and discovers duplicates by NEIGHBOR equality
  * inside each sorted partition — no second pass, no join, exactly the
  * suffix-array economics at cluster scale. Range partitioning puts all
  * equal keys in one partition (boundaries are key values), so the
  * neighbor scan never misses a cross-partition pair; AQE-skew cannot
  * split a single key range. The per-partition scan is the one
  * imperative step (mapPartitions — genuine per-partition neighbor
  * logic): it buffers only the CURRENT equal-key run, and only until the
  * run's second distinct document appears (then it flushes and streams),
  * so memory is bounded by one document's positions for one gram, never
  * by the corpus. The suffix keys are length-bounded (`minLen` tokens,
  * the paper's threshold) — full suffixes would be quadratic bytes;
  * prefixes of the threshold length are exactly sufficient to decide
  * duplication at that threshold.
  *
  * Output: (doc_id, span_start, span_end, span_len), token positions
  * 1-based, one row per maximal duplicated run, cross-document only
  * (within-document repeats alone do not mark positions).
  */
object SuffixSpans {

  /** Maximal cross-document duplicated spans of any length >= `minLen`.
    *
    * `fingerprint` (default TRUE — the 100 TB configuration): shuffle a
    * 128-bit gram fingerprint — two independent xxhash64 values over
    * the token slice — instead of the joined token string. The sorted
    * row drops from ~(8 + 4 + tokens) bytes to 28, which is what
    * bounds the one range-shuffle's spill volume at scale (the
    * round-17 ×100 probe was disk-bound on exactly this shuffle). A
    * false duplicate needs BOTH 64-bit halves to collide across two
    * distinct grams inside one equal-key run — ~n²/2^129: at 10^12
    * suffixes the expected count is ~10^-15, zero in any real corpus.
    * `fingerprint = false` keeps the exact string keys; a spec pins
    * output identity between the two forms on the test corpus.
    */
  def dupSpans(corpus: DataFrame, minLen: Int,
      idCol: String = "doc_id", textCol: String = "text",
      fingerprint: Boolean = true): DataFrame = {
    require(minLen >= 2, s"minLen=$minLen: threshold must be >= 2 tokens")
    val spark = corpus.sparkSession
    import spark.implicits._
    val grams = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("ws"))
      .select(col("doc_id"),
        explode(TextAnalysis.gramStarts(col("ws"), minLen)).as("s"),
        col("ws"))
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // ONE shuffle: range-partition by key (equal keys co-located), sort
    // within partitions, then the streaming neighbor scan marks every
    // suffix whose equal-key run spans >= 2 distinct documents. The
    // scan buffers only the current equal-key run, and only until its
    // second distinct document appears.
    def neighborScan[K](sorted: org.apache.spark.sql.Dataset[(Long, Int, K)])
        : DataFrame =
      sorted.mapPartitions { it =>
        new Iterator[(Long, Int)] {
          private var runKey: K = null.asInstanceOf[K]
          private var haveKey = false
          private var runDoc = 0L          // first document seen in run
          private var multiDoc = false     // run known cross-document
          private val held = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          private var out: Iterator[(Long, Int)] = Iterator.empty
          private def advance(): Unit = {
            while (!out.hasNext && it.hasNext) {
              val (d, s, k) = it.next()
              if (!haveKey || k != runKey) {
                runKey = k; haveKey = true; runDoc = d; multiDoc = false
                held.clear(); held += ((d, s))
              } else if (multiDoc) {
                out = Iterator((d, s))
              } else if (d != runDoc) {
                multiDoc = true
                held += ((d, s))
                out = held.toList.iterator
                held.clear()
              } else {
                held += ((d, s))
              }
            }
          }
          def hasNext: Boolean = { advance(); out.hasNext }
          def next(): (Long, Int) = { advance(); out.next() }
        }
      }.toDF("doc_id", "s")
    def neighborScanFp(
        sorted: org.apache.spark.sql.Dataset[(Long, Int, Long, Long)])
        : DataFrame =
      sorted.mapPartitions { it =>
        new Iterator[(Long, Int)] {
          private var k1 = 0L; private var k2 = 0L
          private var haveKey = false
          private var runDoc = 0L
          private var multiDoc = false
          private val held = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          private var out: Iterator[(Long, Int)] = Iterator.empty
          private def advance(): Unit = {
            while (!out.hasNext && it.hasNext) {
              val (d, s, a, b) = it.next()
              if (!haveKey || a != k1 || b != k2) {
                k1 = a; k2 = b; haveKey = true; runDoc = d; multiDoc = false
                held.clear(); held += ((d, s))
              } else if (multiDoc) {
                out = Iterator((d, s))
              } else if (d != runDoc) {
                multiDoc = true
                held += ((d, s))
                out = held.toList.iterator
                held.clear()
              } else {
                held += ((d, s))
              }
            }
          }
          def hasNext: Boolean = { advance(); out.hasNext }
          def next(): (Long, Int) = { advance(); out.next() }
        }
      }.toDF("doc_id", "s")
    val starts =
      if (fingerprint) {
        val sl = slice(col("ws"), col("s"), lit(minLen))
        neighborScanFp(grams
          .select(col("doc_id"), col("s"),
            xxhash64(sl).as("k1"), xxhash64(sl, lit(1337L)).as("k2"))
          .repartitionByRange(parts, col("k1"), col("k2"))
          .sortWithinPartitions("k1", "k2")
          .as[(Long, Int, Long, Long)])
      } else
        neighborScan(grams
          .select(col("doc_id"), col("s"),
            array_join(slice(col("ws"), col("s"), lit(minLen)), " ").as("k"))
          .repartitionByRange(parts, col("k"))
          .sortWithinPartitions("k")
          .as[(Long, Int, String)])
    // Covered positions → maximal runs (per-doc window: one document's
    // positions per partition-group, never a corpus funnel).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("p")
    starts
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(minLen - 1))).as("p"))
      .distinct()
      .select(col("doc_id"), col("p").cast("long").as("p"))
      .withColumn("grp", col("p") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min("p").as("span_start"), max("p").as("span_end"),
        (max("p") - min("p") + 1).as("span_len"))
      .select("doc_id", "span_start", "span_end", "span_len")
  }
}
