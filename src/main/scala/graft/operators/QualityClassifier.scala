package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the fastText-style linear
  * classifier every modern pretraining pipeline runs after the rule-based
  * passes (GPT-3/LLaMA-style "quality classifier": hashed bag-of-words
  * features into logistic regression; Joulin et al. 2016 for the
  * architecture — public papers).
  *
  * Features are hashed token PRESENCE indicators (`dim` buckets,
  * murmur-style string hash, 1.0 when any token lands in the bucket) —
  * bounded per document regardless of length, and each informative token
  * contributes a full-magnitude gradient (count-normalized features shrink
  * every signal by 1/doc-length and stall full-batch GD). Training is
  * full-batch gradient descent on L2-regularized logistic loss:
  * each iteration is ONE distributed pass — the gradient is a
  * `treeAggregate` of per-document dense contributions (dim+1 doubles of
  * state per task, combined tree-wise), the weight vector broadcasts back
  * — the exact shape MLlib's own linear models use, linear in corpus size
  * with O(dim) driver state, nothing corpus-sized collected.
  *
  * Determinism: same corpus + partitioning → identical model; across
  * partitionings the float gradient sum reorders and weights can drift in
  * ulps — so the SPEC pins separation quality (planted classes recovered,
  * loss decreasing), not bitwise weights, and there is deliberately no
  * DuckDB oracle for the trainer.
  */
object QualityClassifier {

  /** Murmur-ish stable string hash → bucket in [0, dim). Stable across
    * JVMs (String.hashCode is specified) — model files survive restarts.
    */
  @inline private def bucket(tok: String, dim: Int): Int = {
    val h = tok.hashCode
    ((h % dim) + dim) % dim
  }

  private[operators] def featurize(text: String, dim: Int): Array[Double] = {
    val x = new Array[Double](dim)
    if (text != null) {
      text.split(" ").foreach { tok =>
        if (tok.nonEmpty) x(bucket(tok, dim)) = 1.0
      }
    }
    x
  }

  @inline private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Train on `(text, label)` — label 1.0 = quality/target. Returns the
    * weight vector (index 0..dim-1) with the intercept at index `dim`.
    */
  def train(docs: DataFrame, labelCol: String, dim: Int = 64,
      iters: Int = 10, lr: Double = 2.0, reg: Double = 1e-4,
      textCol: String = "text"): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val data: Dataset[(Double, Array[Double])] = docs
      .select(col(labelCol).cast("double"), col(textCol))
      .as[(Double, String)]
      .map { case (y, text) => (y, featurize(text, dim)) }
    data.cache()
    val n = data.count().toDouble
    require(n > 0, "empty training corpus")
    var w = new Array[Double](dim + 1)
    for (_ <- 1 to iters) {
      val bw = spark.sparkContext.broadcast(w)
      // grad has dim+1 slots (intercept last); slot dim+1 carries loss.
      val grad = data.rdd.treeAggregate(new Array[Double](dim + 2))(
        seqOp = (acc, d) => {
          val (y, x) = d
          val wv = bw.value
          var z = wv(dim); var i = 0
          while (i < x.length) { z += wv(i) * x(i); i += 1 }
          val p = sigmoid(z)
          val err = p - y
          i = 0
          while (i < x.length) { acc(i) += err * x(i); i += 1 }
          acc(dim) += err
          acc(dim + 1) += (if (y > 0.5) -math.log(math.max(p, 1e-12))
            else -math.log(math.max(1 - p, 1e-12)))
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      bw.destroy()
      val next = new Array[Double](dim + 1)
      var i = 0
      while (i <= dim) {
        val regTerm = if (i < dim) reg * w(i) else 0.0 // don't shrink intercept
        next(i) = w(i) - lr * (grad(i) / n + regTerm)
        i += 1
      }
      w = next
    }
    data.unpersist()
    w
  }

  /** Mean logistic loss of `weights` on the corpus — the train-metric
    * hook the spec uses to pin "GD descends".
    */
  def loss(docs: DataFrame, labelCol: String, weights: Array[Double],
      textCol: String = "text"): Double = {
    val dim = weights.length - 1
    val scored = score(docs, weights, textCol)
      .select(col(labelCol).cast("double").as("y"), col("p"))
    val row = scored.select(
      sum(when(col("y") > 0.5, -log(greatest(col("p"), lit(1e-12))))
        .otherwise(-log(greatest(lit(1.0) - col("p"), lit(1e-12))))).as("l"),
      count(lit(1)).as("n")).head()
    row.getDouble(0) / row.getLong(1)
  }

  /** Scoring under a PUBLISHED integer-milli lexicon model — the shipped
    * artifact a 100 TB filter job actually runs (training happens once,
    * offline; the fleet only scores). `weightsMilli` maps literal tokens
    * to milli-weights; the score is the exact integer
    * `z_milli = interceptMilli + Σ w(tok) · [tok ∈ doc]` and the keep
    * decision is `z_milli >= 0` ⟺ `sigmoid(z/1000) >= 0.5` — no float
    * anywhere, so a SQL engine recomputes it bit-for-bit (this is what
    * makes the declared gate query oracle-able where raw GD training,
    * whose float gradient sums reorder across partitionings, is not).
    * For a small lexicon the weights inline as literals in one codegen'd
    * projection (presence terms over one `split`); a 1e5-token production
    * lexicon would swap the fold for a broadcast map lookup with the same
    * row-local shape. Output: input columns + `z_milli` (long) + `keep`.
    */
  def scoreLexicon(docs: DataFrame, weightsMilli: Seq[(String, Long)],
      interceptMilli: Long, textCol: String = "text"): DataFrame = {
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val z = weightsMilli.foldLeft(lit(interceptMilli).cast("long")) {
      case (acc, (tok, w)) =>
        acc + when(array_contains(toks, tok), lit(w)).otherwise(lit(0L))
    }
    docs.withColumn("z_milli", z).withColumn("keep", col("z_milli") >= 0)
  }

  /** Row-local scoring pass: corpus columns + `p` (quality probability).
    * The model broadcasts; one narrow map — the 100 TB filter shape.
    */
  def score(docs: DataFrame, weights: Array[Double],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val dim = weights.length - 1
    val bw = spark.sparkContext.broadcast(weights)
    val scoreUdf = udf { text: String =>
      val x = featurize(text, dim)
      val wv = bw.value
      var z = wv(dim); var i = 0
      while (i < dim) { z += wv(i) * x(i); i += 1 }
      sigmoid(z)
    }
    docs.withColumn("p", scoreUdf(col(textCol)))
  }
}
