package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for embedding math — the hot path of
  * similarity search. A `zip_with`/`aggregate` higher-order formulation is
  * semantically identical but always evaluates interpreted (lambda per
  * element); these expressions generate a tight primitive loop inside
  * whole-stage codegen. Accumulation is double precision in index order, so
  * results are bit-identical to the ordered fold (asserted in
  * PipelineSpec).
  */
object VectorExpressions {

  /** Dimension guard shared by every kernel: mismatched vectors mean a
    * corrupt/truncated embedding column, and silently scoring the common
    * prefix returns confidently WRONG similarities (a 1-element vector
    * "matches" anything at cosine 1.0). DuckDB's array_cosine_similarity
    * errors on mismatch; so do we — fail the task loudly.
    */
  def requireSameDim(fn: String, an: Int, bn: Int): Unit =
    if (an != bn) throw new IllegalArgumentException(
      s"$fn: vector dimension mismatch ($an vs $bn) — corrupt or truncated embedding")

  /** dot/norm kernel shared by interpreted eval. */
  private[functions] def dotNorms(a: ArrayData, b: ArrayData): (Double, Double, Double) = {
    val n = a.numElements()
    requireSameDim("vector_cosine", n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    (dot, na, nb)
  }

  /** One-pass binary kernel behind DuckDB's `array_*` similarity
    * functions (host capability — DuckDB ≥1.1 ships
    * array_inner_product/array_distance/array_cosine_similarity et al.).
    * kind: 0 = inner product, 1 = negative inner product, 2 = Euclidean
    * distance, 3 = cosine distance. A single static call keeps the
    * generated code a one-liner while the loop JITs hot.
    */
  def binaryKernel(a: ArrayData, b: ArrayData, kind: Int): Double = {
    val n = a.numElements()
    requireSameDim("array_kernel", n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var d2 = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      val d = x - y; d2 += d * d
      i += 1
    }
    kind match {
      case 0 => dot
      case 1 => -dot
      case 2 => math.sqrt(d2)
      case _ => 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** Spark-`round(x, 6)` semantics (HALF_UP on the decimal string value) —
    * shared by eval and codegen so argmax ties quantize identically to the
    * SQL formulation. Non-finite values pass through like Spark's `round`
    * (BigDecimal.valueOf(NaN) THROWS — before this guard a zero-norm
    * corpus row, whose cosine is NaN against every centroid, crashed the
    * assignment task instead of taking the documented never-wins path).
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isFinite(x))
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    else x

  /** Sign-LSH bucket kernel: bit j of the result is sign(dot(v, h_j)) > 0,
    * all hyperplanes evaluated in ONE pass over the vector (the
    * per-hyperplane Column formulation re-scans the array once per bit).
    * dot(v,h) > 0 iff cosine(v,h) > 0 for nonzero norms, so buckets match
    * the fold-based definition.
    */
  def signLshBucket(v: ArrayData, planes: Array[Array[Float]]): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val h = planes(j)
      requireSameDim("sign_lsh_bucket", n, h.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * h(i).toDouble; i += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Banded sign-LSH kernel: `planes.length / bits` band buckets, band b's
    * bucket built from the signs of planes [b*bits, (b+1)*bits) — ALL
    * bands evaluated in one pass over the vector. Banding is what makes
    * sign-LSH corpus-size-aware: deeper buckets (more bits) keep per-bucket
    * occupancy bounded as the corpus grows, and more bands buy back the
    * recall the extra bits cost (mirroring minhash's (bands × rows)
    * trade-off).
    */
  def signLshBands(v: ArrayData, planes: Array[Array[Float]], bits: Int): ArrayData = {
    val bands = planes.length / bits
    val n = v.numElements()
    val out = new Array[Long](bands)
    var b = 0
    var j = 0
    while (b < bands) {
      var bucket = 0L
      var k = 0
      while (k < bits) {
        val h = planes(j)
        requireSameDim("sign_lsh_bands", n, h.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * h(i).toDouble; i += 1 }
        if (dot > 0) bucket |= (1L << k)
        k += 1; j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization code kernel: for each of the `codebook.length`
    * subspaces, the id of the codeword whose squared L2 distance to the
    * vector's subvector is smallest — distance quantized via [[round6]]
    * and resolved to the smallest-INDEX codeword on ties, so with ids
    * sorted ascending the winner is the smallest id, the same
    * deterministic contract [[bestCentroid]] carries (and the one a SQL
    * `row_number() OVER (ORDER BY dist, id)` oracle reproduces).
    * `codebook(s)(j)` is codeword j of subspace s (all k×subdim);
    * subspace s covers vector positions [s·subdim, (s+1)·subdim). One
    * pass, O(k·dim) multiplies per row — identical to a flat centroid
    * assignment; the payoff is STORAGE (m small ids ≈ m bytes at k≤256
    * per vector vs dim·4 bytes) and ADC scan cost downstream.
    */
  def pqCodes(v: ArrayData, ids: Array[Long],
      codebook: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebook.length
    val n = v.numElements()
    val sub = if (m == 0) 0 else codebook(0)(0).length
    requireSameDim("pq_codes", n, m * sub)
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val words = codebook(s)
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < words.length) {
        val w = words(j)
        requireSameDim("pq_codes", sub, w.length)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = v.getFloat(s * sub + i).toDouble - w(i).toDouble
          d += diff * diff
          i += 1
        }
        val q = round6(d)
        if (q < best) { best = q; bestJ = j }
        j += 1
      }
      out(s) = ids(bestJ)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance kernel (ADC): squared L2 between a FULL query
    * vector and the RECONSTRUCTION the codes describe — the scoring side
    * of PQ search, summed per subspace against the coded codeword, in
    * index order (deterministic).
    */
  def pqAdcDist(v: ArrayData, codes: ArrayData, ids: Array[Long],
      codebook: Array[Array[Array[Float]]]): Double = {
    val m = codebook.length
    val n = v.numElements()
    val sub = if (m == 0) 0 else codebook(0)(0).length
    requireSameDim("pq_adc_dist", n, m * sub)
    requireSameDim("pq_adc_dist", codes.numElements(), m)
    var total = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getLong(s)
      // ids are ascending: binary search for the codeword index.
      var lo = 0; var hi = ids.length - 1; var idx = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ids(mid) == code) { idx = mid; lo = hi + 1 }
        else if (ids(mid) < code) lo = mid + 1
        else hi = mid - 1
      }
      if (idx < 0) throw new IllegalArgumentException(
        s"pq_adc_dist: code $code not in the codebook id set")
      val w = codebook(s)(idx)
      var i = 0
      while (i < sub) {
        val diff = v.getFloat(s * sub + i).toDouble - w(i).toDouble
        total += diff * diff
        i += 1
      }
      s += 1
    }
    // Round-6 quantized like every other ranking path (assignment,
    // probe selection, codes): shortlist ranks become exactly
    // replicable by a SQL oracle regardless of either engine's
    // float-summation order; genuine near-ties fall to the
    // neighbor-id tiebreak deterministically on both sides (round 19).
    round6(total)
  }

  /** Row-local nearest-centroid kernel: id of the codebook vector with the
    * greatest `round(cosine, 6)`, smallest id on ties (ids are sorted
    * ascending and the comparison is strict). Called from both interpreted
    * eval and generated code. NaN scores (zero-norm vectors) never win;
    * an all-NaN row falls back to the first id.
    */
  def bestCentroid(v: ArrayData, ids: Array[Long], cents: Array[Array[Float]]): Long = {
    val n = v.numElements()
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      requireSameDim("best_centroid", n, ce.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble
        val y = ce(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cs = round6(dot / (math.sqrt(na) * math.sqrt(nb)))
      if (cs > best) { best = cs; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** Two-level (coarse→fine) nearest-centroid kernel — the large-k form of
    * [[bestCentroid]]. The codebook is pre-partitioned into coarse cells
    * (CSR layout: cell c's fine centroids are `fineIds`/`fineVecs` indices
    * `cellStart(c) until cellStart(c+1)`, ids ascending within a cell);
    * per row, the `nProbe` highest-cosine coarse cells are selected and
    * only their fine centroids scored — per-vector work drops from O(k) to
    * O(√k + nProbe·k/√k) dot products. Approximate: the true argmax can sit
    * in an unprobed cell. Deterministic: fine comparison is
    * (round6-cosine, then smaller id), which with nProbe ≥ cell count
    * reproduces [[bestCentroid]] EXACTLY (its ascending strict-> scan also
    * resolves ties to the smallest id) — the parity lever the spec uses.
    * NaN scores never win anywhere; an all-NaN row (zero-norm vector)
    * falls back to the GLOBAL minimum id — `fineIds` is cell-grouped, so
    * the rare path scans for it — matching [[bestCentroid]]'s `ids(0)` on
    * its ascending layout.
    */
  def bestCentroidTwoLevel(v: ArrayData, coarse: Array[Array[Float]],
      cellStart: Array[Int], fineIds: Array[Long], fineVecs: Array[Array[Float]],
      nProbe: Int): Long = {
    val n = v.numElements()
    // Query norm once; coarse + fine scoring both reuse it.
    var nv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    val vNorm = math.sqrt(nv)
    // Top-nProbe coarse cells by (cosine, then smaller cell index):
    // insertion into two small parallel arrays (nProbe is ~8).
    val p = math.min(nProbe, coarse.length)
    val cellOf = new Array[Int](p)
    val scoreOf = new Array[Double](p)
    var filled = 0
    var c = 0
    while (c < coarse.length) {
      val ce = coarse(c)
      requireSameDim("best_centroid_2level", n, ce.length)
      var dot = 0.0; var nb = 0.0
      i = 0
      while (i < n) {
        val y = ce(i).toDouble
        dot += v.getFloat(i).toDouble * y; nb += y * y
        i += 1
      }
      val raw = dot / (vNorm * math.sqrt(nb))
      // A NaN coarse score (zero-norm cell mean) ranks below every real
      // score but is still probed when slots remain — so nProbe ≥ cell
      // count probes EVERY cell, the exact-parity guarantee.
      val cs = if (raw == raw) raw else Double.NegativeInfinity
      var pos = filled
      while (pos > 0 && scoreOf(pos - 1) < cs) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var j = last
        while (j > pos) { scoreOf(j) = scoreOf(j - 1); cellOf(j) = cellOf(j - 1); j -= 1 }
        scoreOf(pos) = cs; cellOf(pos) = c
        if (filled < p) filled += 1
      }
      c += 1
    }
    // Exhaustive scoring within the probed cells.
    var best = Double.NegativeInfinity
    var bestId = fineIds(0)
    var haveBest = false
    var s = 0
    while (s < filled) {
      val cell = cellOf(s)
      var f = cellStart(cell)
      val end = cellStart(cell + 1)
      while (f < end) {
        val ce = fineVecs(f)
        requireSameDim("best_centroid_2level", n, ce.length)
        var dot = 0.0; var nb = 0.0
        i = 0
        while (i < n) {
          val y = ce(i).toDouble
          dot += v.getFloat(i).toDouble * y; nb += y * y
          i += 1
        }
        val cs = round6(dot / (vNorm * math.sqrt(nb)))
        if (cs > best || (cs == best && haveBest && fineIds(f) < bestId)) {
          best = cs; bestId = fineIds(f); haveBest = true
        }
        f += 1
      }
      s += 1
    }
    if (!haveBest) {
      // All probed scores NaN (zero-norm row): match bestCentroid's
      // ids(0) fallback — the global min id, found by scan since fineIds
      // is cell-grouped rather than globally sorted.
      var mn = fineIds(0)
      var f = 1
      while (f < fineIds.length) { if (fineIds(f) < mn) mn = fineIds(f); f += 1 }
      mn
    } else bestId
  }

  /** Top-`nOut` centroids (by round6-cosine desc, id asc) through the
    * two-level codebook — the probe-SELECTION sibling of
    * [[bestCentroidTwoLevel]]: score the √k coarse cell means, probe the
    * top `nProbeCells`, rank only their fine members. Replaces the
    * query×k crossJoin + per-query window the IVF probe step would
    * otherwise shuffle at large k. With nProbeCells ≥ cell count the
    * ranking is exhaustive and EQUALS the crossJoin+window selection
    * (same (round6 desc, id asc) key — parity pinned in PipelineSpec).
    * NaN fine scores (zero-norm query or centroid) never rank; an
    * all-NaN row returns an empty array (the caller's explode then emits
    * no probes — no candidates is the honest answer for a zero-norm
    * query, where every cosine is undefined).
    */
  def topCentroidsTwoLevel(v: ArrayData, coarse: Array[Array[Float]],
      cellStart: Array[Int], fineIds: Array[Long], fineVecs: Array[Array[Float]],
      nProbeCells: Int, nOut: Int): ArrayData = {
    val n = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    val vNorm = math.sqrt(nv)
    // Top-nProbeCells coarse cells — same insertion scheme as
    // bestCentroidTwoLevel (NaN cells rank last but still fill slots).
    val p = math.min(nProbeCells, coarse.length)
    val cellOf = new Array[Int](p)
    val scoreOf = new Array[Double](p)
    var filled = 0
    var c = 0
    while (c < coarse.length) {
      val ce = coarse(c)
      requireSameDim("top_centroids_2level", n, ce.length)
      var dot = 0.0; var nb = 0.0
      i = 0
      while (i < n) {
        val y = ce(i).toDouble
        dot += v.getFloat(i).toDouble * y; nb += y * y
        i += 1
      }
      val raw = dot / (vNorm * math.sqrt(nb))
      val cs = if (raw == raw) raw else Double.NegativeInfinity
      var pos = filled
      while (pos > 0 && scoreOf(pos - 1) < cs) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var j = last
        while (j > pos) { scoreOf(j) = scoreOf(j - 1); cellOf(j) = cellOf(j - 1); j -= 1 }
        scoreOf(pos) = cs; cellOf(pos) = c
        if (filled < p) filled += 1
      }
      c += 1
    }
    // Top-nOut fine centroids across the probed cells by
    // (round6-cosine desc, id asc): insertion into two parallel arrays
    // (nOut is probe-count-scale, ~4-16).
    val outId = new Array[Long](nOut)
    val outCs = new Array[Double](nOut)
    var kept = 0
    var s = 0
    while (s < filled) {
      val cell = cellOf(s)
      var f = cellStart(cell)
      val end = cellStart(cell + 1)
      while (f < end) {
        val ce = fineVecs(f)
        requireSameDim("top_centroids_2level", n, ce.length)
        var dot = 0.0; var nb = 0.0
        i = 0
        while (i < n) {
          val y = ce(i).toDouble
          dot += v.getFloat(i).toDouble * y; nb += y * y
          i += 1
        }
        val cs = round6(dot / (vNorm * math.sqrt(nb)))
        if (cs == cs) { // NaN never ranks
          val id = fineIds(f)
          var pos = kept
          while (pos > 0 && (outCs(pos - 1) < cs ||
            (outCs(pos - 1) == cs && outId(pos - 1) > id))) pos -= 1
          if (pos < nOut) {
            val last = math.min(kept, nOut - 1)
            var j = last
            while (j > pos) { outCs(j) = outCs(j - 1); outId(j) = outId(j - 1); j -= 1 }
            outCs(pos) = cs; outId(pos) = id
            if (kept < nOut) kept += 1
          }
        }
        f += 1
      }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(outId, kept))
  }
}

/** cosine(a, b) over two array<float> columns, fully codegen'd. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_cosine requires (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (dot, na, nb) = VectorExpressions.dotNorms(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        graft.functions.VectorExpressions.requireSameDim(
          "vector_cosine", $a.numElements(), $b.numElements());
        int $n = $a.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.getFloat($i);
          double $y = (double) $b.getFloat($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_cosine"
}

/** L2 norm of an array<float> column, fully codegen'd. */
case class VectorNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vector_norm requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < arr.numElements()) {
      val x = arr.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
        double $s = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          double $x = (double) $a.getFloat($i);
          $s += $x * $x;
        }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)

  override def prettyName: String = "vector_norm"
}

/** DuckDB's binary `array_*` similarity functions over array<float>
  * vectors — inner product, negative inner product, Euclidean distance,
  * cosine distance — as one parametric codegen'd kernel (see
  * [[VectorExpressions.binaryKernel]]). Registered under DuckDB's names
  * by the SQL extension with a float-array cast on both inputs, so
  * double-array literals work as they do there.
  */
case class VectorBinaryKernel(left: Expression, right: Expression,
    kind: Int, fnName: String) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$fnName requires (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.binaryKernel(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], kind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorExpressions.binaryKernel($a, $b, $kind);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorBinaryKernel =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = fnName
}

/** best_centroid(v): id of the nearest codebook centroid by quantized
  * cosine — the row-local replacement for the crossJoin + Window argmax
  * that IVF assignment would otherwise pay a k×N shuffle for. The codebook
  * (codebook-scale k, collected on the driver) rides into generated code
  * as reference objects, so assignment is a pure map: zero joins, zero
  * exchanges, stays inside whole-stage codegen.
  */
case class BestCentroid(child: Expression, ids: Array[Long],
    centroids: Array[Array[Float]]) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == centroids.length)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"best_centroid requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.bestCentroid(a.asInstanceOf[ArrayData], ids, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("centroidVecs", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorExpressions.bestCentroid($a, $idsRef, $centsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BestCentroid =
    copy(child = newChild)

  override def prettyName: String = "best_centroid"
}

/** pq_codes(v): per-subspace nearest-codeword ids (product quantization)
  * as a row-local codegen'd map — no joins, no exchanges, the same
  * zero-shuffle assignment contract as [[BestCentroid]]. The codebook
  * (m subspaces × k codewords × subdim floats — k·dim floats total, the
  * IVF-codebook transport envelope) rides into generated code as
  * reference objects.
  */
case class PqCodes(child: Expression, ids: Array[Long],
    codebook: Array[Array[Array[Float]]]) extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.length == ids.length),
    "pq_codes: every subspace needs one codeword per id")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.pqCodes(a.asInstanceOf[ArrayData], ids, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[]")
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorExpressions.pqCodes($a, $idsRef, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

/** pq_adc_dist(v, codes): asymmetric squared-L2 distance between a full
  * query vector and a PQ-coded corpus vector — the scoring expression of
  * a PQ search scan, codegen'd like [[PqCodes]].
  */
case class PqAdcDist(left: Expression, right: Expression, ids: Array[Long],
    codebook: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dist requires (array<float>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, c: Any): Any =
    VectorExpressions.pqAdcDist(
      a.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], ids, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[]")
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    nullSafeCodeGen(ctx, ev, (a, c) =>
      s"${ev.value} = graft.functions.VectorExpressions.pqAdcDist($a, $c, $idsRef, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_dist"
}

/** [[BestCentroid]] with the codebook carried as a Spark BROADCAST
  * variable instead of expression-tree reference objects — the large-k
  * form. Embedding the arrays in the tree means every serialized stage
  * that contains the expression ships the whole codebook (and re-ships it
  * with every task-binary broadcast); at IVF codebook scales beyond a few
  * thousand centroids (k·dim·4 bytes — k=10⁴ at dim 768 is ~30 MB) that
  * dominates plan shipping. The broadcast handle serializes to a few
  * bytes, executors fetch the codebook once via the torrent protocol, and
  * the generated code caches the dereferenced arrays in mutable state so
  * the per-row loop is IDENTICAL to [[BestCentroid]]'s — same kernel,
  * same quantized-cosine tie-breaks, bit-identical assignments (parity
  * asserted in PipelineSpec at k=4096).
  */
case class BestCentroidBroadcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Array[Float]])])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"best_centroid requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  @transient private lazy val codebook = bc.value

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.bestCentroid(a.asInstanceOf[ArrayData], codebook._1, codebook._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val ids = ctx.addMutableState("long[]", "bcCentroidIds")
    val cents = ctx.addMutableState("float[][]", "bcCentroidVecs")
    nullSafeCodeGen(ctx, ev, a =>
      s"""if ($ids == null) {
         |  scala.Tuple2 t = (scala.Tuple2) $bcRef.value();
         |  $ids = (long[]) t._1();
         |  $cents = (float[][]) t._2();
         |}
         |${ev.value} = graft.functions.VectorExpressions.bestCentroid($a, $ids, $cents);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BestCentroidBroadcast =
    copy(child = newChild)

  override def prettyName: String = "best_centroid_bcast"
}

/** IVF-style two-level assignment — the k-beyond-broadcast-scale form.
  * Scoring every centroid is O(k·dim) per row; at the SemDeDup contract's
  * k ≈ N/clusterSize (10⁵-10⁶ on 100 TB) that linear scan IS the k-means
  * bill. The codebook ships (broadcast) pre-partitioned into ~√k coarse
  * cells; each row scores the √k cell means, probes the top `nProbe`
  * cells, and scores only their fine centroids —
  * O(√k + nProbe·√k) per row, a ~k/(√k·(nProbe+1)) work cut (11× at
  * k=10⁴, ~30× at 10⁵). Approximate by design (the argmax can hide in an
  * unprobed cell) but deterministic, duplicate-consistent (identical
  * vectors always agree — the property SemDeDup's recall rests on), and
  * EXACTLY [[BestCentroid]] when nProbe ≥ cell count (parity asserted in
  * PipelineSpec).
  */
case class BestCentroidTwoLevel(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      (Array[Array[Float]], Array[Int], Array[Long], Array[Array[Float]])],
    nProbe: Int)
  extends UnaryExpression {

  require(nProbe >= 1, s"best_centroid_2level: nProbe must be >= 1, got $nProbe")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"best_centroid_2level requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  @transient private lazy val cb = bc.value

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.bestCentroidTwoLevel(a.asInstanceOf[ArrayData],
      cb._1, cb._2, cb._3, cb._4, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("twoLevelBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val coarse = ctx.addMutableState("float[][]", "tlCoarse")
    val starts = ctx.addMutableState("int[]", "tlCellStart")
    val ids = ctx.addMutableState("long[]", "tlFineIds")
    val vecs = ctx.addMutableState("float[][]", "tlFineVecs")
    nullSafeCodeGen(ctx, ev, a =>
      s"""if ($ids == null) {
         |  scala.Tuple4 t = (scala.Tuple4) $bcRef.value();
         |  $coarse = (float[][]) t._1();
         |  $starts = (int[]) t._2();
         |  $ids = (long[]) t._3();
         |  $vecs = (float[][]) t._4();
         |}
         |${ev.value} = graft.functions.VectorExpressions.bestCentroidTwoLevel(
         |  $a, $coarse, $starts, $ids, $vecs, $nProbe);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BestCentroidTwoLevel =
    copy(child = newChild)

  override def prettyName: String = "best_centroid_2level"
}

/** top_centroids_2level(v): the `nOut` nearest codebook ids through the
  * two-level coarse→fine codebook — IVF probe selection as a row-local
  * expression. The large-k replacement for the queries×codebook
  * crossJoin + per-query window (q×k rows shuffled and sorted just to
  * keep nProbe of them); here each query row scores √k cell means, probes
  * the top `nProbeCells` cells, and emits an array<long> of centroid ids
  * ranked (round6-cosine desc, id asc). Shares [[BestCentroidTwoLevel]]'s
  * broadcast codebook — one build per job serves corpus assignment AND
  * probe selection.
  */
case class TopCentroidsTwoLevel(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      (Array[Array[Float]], Array[Int], Array[Long], Array[Array[Float]])],
    nProbeCells: Int, nOut: Int)
  extends UnaryExpression {

  require(nProbeCells >= 1 && nOut >= 1,
    s"top_centroids_2level: nProbeCells/nOut must be >= 1, got $nProbeCells/$nOut")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_centroids_2level requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cb = bc.value

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.topCentroidsTwoLevel(a.asInstanceOf[ArrayData],
      cb._1, cb._2, cb._3, cb._4, nProbeCells, nOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("topCentroidsBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val coarse = ctx.addMutableState("float[][]", "tcCoarse")
    val starts = ctx.addMutableState("int[]", "tcCellStart")
    val ids = ctx.addMutableState("long[]", "tcFineIds")
    val vecs = ctx.addMutableState("float[][]", "tcFineVecs")
    nullSafeCodeGen(ctx, ev, a =>
      s"""if ($ids == null) {
         |  scala.Tuple4 t = (scala.Tuple4) $bcRef.value();
         |  $coarse = (float[][]) t._1();
         |  $starts = (int[]) t._2();
         |  $ids = (long[]) t._3();
         |  $vecs = (float[][]) t._4();
         |}
         |${ev.value} = graft.functions.VectorExpressions.topCentroidsTwoLevel(
         |  $a, $coarse, $starts, $ids, $vecs, $nProbeCells, $nOut);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroidsTwoLevel =
    copy(child = newChild)

  override def prettyName: String = "top_centroids_2level"
}

/** sign_lsh_bands(v): array of per-band sign-LSH buckets (`bits` planes
  * each), all bands computed in one codegen'd pass over the vector. The
  * scale-aware replacement for a single fixed-width bucket: band count and
  * bit depth are tuned to corpus size and threshold by
  * [[graft.operators.Similarity.signLshParamsFor]].
  */
case class SignLshBandsExpr(child: Expression, hyperplanes: Array[Array[Float]],
    bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63 && hyperplanes.nonEmpty &&
    hyperplanes.length % bits == 0)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bands requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.signLshBands(a.asInstanceOf[ArrayData], hyperplanes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshBandPlanes", hyperplanes, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorExpressions.signLshBands($a, $planesRef, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBandsExpr =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_bands"
}

/** sign_lsh_bucket(v): 2^k-way LSH bucket from the signs of k hyperplane
  * dot products, computed in one codegen'd pass over the vector (the
  * Column-combinator formulation costs one array scan PER hyperplane).
  */
case class SignLshBucketExpr(child: Expression, hyperplanes: Array[Array[Float]])
    extends UnaryExpression {

  require(hyperplanes.nonEmpty && hyperplanes.length <= 63)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bucket requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    VectorExpressions.signLshBucket(a.asInstanceOf[ArrayData], hyperplanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", hyperplanes, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorExpressions.signLshBucket($a, $planesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_bucket"
}
