package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a distributed corpus
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — public paper; the merge-learning loop every BPE/WordPiece
  * trainer runs).
  *
  * Scale design — the classic two-level decomposition:
  *
  *  1. ONE corpus pass builds the `(word, freq)` table ([[wordFreqs]]).
  *     Everything after runs on that table, which is Zipf-small relative
  *     to the corpus (vocabulary grows ~corpus^0.5 under Heaps' law) —
  *     at 100 TB the corpus is petatokens but the distinct-word table is
  *     merely billions of rows, still a comfortably distributed DataFrame
  *     (never collected).
  *  2. Each merge round is: weighted adjacent-pair count over the word
  *     table (map-side combined aggregate), a 1-ROW collect of the argmax
  *     pair (bounded — the only driver traffic), and a row-local symbol
  *     rewrite. The per-round state (word → current symbol array) is
  *     scratch-materialized so plan depth stays O(1) across rounds, with
  *     the superseded round deleted eagerly — the same lifecycle
  *     discipline as [[Dedup]]'s label propagation.
  *
  * Determinism: the winning pair is (count DESC, left ASC, right ASC) —
  * total order, no float anywhere — so the learned merge list is
  * bit-identical under any partitioning.
  */
object Bpe {

  /** `(word, f)` — distinct whitespace words with occurrence counts; the
    * one corpus-sized pass. Empty words (leading/trailing/double spaces)
    * carry no pairs and are dropped here.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** 1..n-1 (empty below 2 elements) — adjacent-pair start indices. */
  private def pairStarts(n: Column): Column =
    when(n >= 2, sequence(lit(1), (n - 1).cast("int")))
      .otherwise(array().cast("array<int>"))

  /** Frequency-weighted adjacent-symbol-pair counts for a
    * `(word, syms, f)` state table: `(a, b, cnt)`.
    */
  private def pairCounts(state: DataFrame): DataFrame =
    state.select(col("f"), col("syms"),
        explode(pairStarts(size(col("syms")))).as("i"))
      .select(element_at(col("syms"), col("i")).as("a"),
        element_at(col("syms"), col("i") + 1).as("b"), col("f"))
      .groupBy("a", "b").agg(sum("f").as("cnt"))

  /** Greedy left-to-right non-overlapping merge of adjacent `(a, b)` into
    * the concatenated symbol — one fold over the symbol array ("a a a"
    * under (a,a) becomes ["aa","a"], the standard BPE convention).
    */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Weighted character-pair statistics of the raw (pre-merge) corpus —
    * the first BPE round's count table, useful standalone as the
    * "which merges would training learn first" diagnostic. Output:
    * `(a, b, cnt)` for the top `k` pairs by (cnt DESC, a ASC, b ASC).
    */
  def pairStats(docs: DataFrame, k: Int = 20, textCol: String = "text"): DataFrame = {
    val wf = wordFreqs(docs, textCol)
    pairCounts(wf.select(col("word"), split(col("word"), "").as("syms"), col("f")))
      .select(col("a"), col("b"), col("cnt").cast("long").as("cnt"))
      .orderBy(desc("cnt"), asc("a"), asc("b"))
      .limit(k)
  }

  /** Learn `nMerges` BPE merges. Output: `(rank, left, right)` with rank
    * 1-based in learning order; fewer rows when the table runs out of
    * adjacent pairs first.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var (state, stateDir) = Scratch.materialize(
      wordFreqs(docs, textCol)
        .select(col("word"), split(col("word"), "").as("syms"), col("f")),
      "bpe_state")
    val merges = Seq.newBuilder[(Long, String, String)]
    var rank = 0L
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = pairCounts(state)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        rank += 1
        merges += ((rank, a, b))
        val (next, nextDir) = Scratch.materialize(
          state.select(col("word"), mergeOnce(col("syms"), a, b).as("syms"), col("f")),
          "bpe_state")
        Scratch.delete(spark, stateDir)
        state = next; stateDir = nextDir
      }
    }
    Scratch.delete(spark, stateDir)
    merges.result().toDF("rank", "left", "right")
  }

  /** Apply a learned merge list to the corpus's DISTINCT word table:
    * `(word, syms, n_sub)` — the tokenizer-application half of BPE
    * (encode), dual to [[train]]. Merges apply in rank order, each as one
    * greedy left-to-right non-overlapping pass — the identical
    * [[mergeOnce]] semantics the trainer rewrites state with, so
    * encode∘train round-trips exactly (spec-pinned).
    *
    * Scale shape: encoding runs on the distinct-word table (Zipf-small,
    * see the object scaladoc), NOT per corpus token — the classic
    * encode-cache trick, here as dataflow. The merge list is a broadcast
    * model artifact (vocabularies are 10⁴-10⁵ merges — driver-bounded by
    * construction, like the codebooks in [[graft.operators.Similarity]]);
    * the per-word merge loop is imperative row-local logic over that
    * broadcast, where an expression chain would nest one HOF per merge
    * (plan/codegen depth O(merges) — not viable at real vocab sizes).
    * Consumers join the encoded table back to the corpus on `word`
    * (plain equi-join, AQE-sizeable).
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(merges)
    wordFreqs(docs, textCol).select(col("word")).as[String]
      .mapPartitions { it =>
        val ms = bm.value
        it.map { w =>
          var syms: Array[String] = w.toCharArray.map(_.toString)
          ms.foreach { case (a, b) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.toArray
          }
          (w, syms)
        }
      }
      .toDF("word", "syms")
      .withColumn("n_sub", size(col("syms")).cast("long"))
  }
}
