package graft.tools

import graft.operators.Similarity

/** Driver-local wall-clock of [[Similarity.buildTwoLevelCodebook]] at the
  * contract's large-k edge — the one piece of the two-level machinery
  * whose cost is superlinear in k and runs on the driver while the
  * cluster idles. A/Bs the full Lloyd fit against the sampled fit
  * (`fitSample`, conf `spark.graft.twoLevelCoarseFitSample`) at the same
  * k, asserting the CSR invariants hold in both (every id present
  * exactly once, cell starts monotone). No SparkSession — this is pure
  * driver compute, exactly as it runs in production.
  *
  * `sbt "runMain graft.tools.ProfileTwoLevelBuild [k] [dim]"`
  */
object ProfileTwoLevelBuild {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val ids = Array.tabulate(k)(_.toLong)
    // Distinct directions per centroid (a modulo-small-prime pattern
    // collapses a million vectors onto a handful of rays, which leaves
    // the timed loops untouched but makes the cell statistics fake).
    val vecs = Array.tabulate(k) { f =>
      var h = f.toLong * 0x9E3779B97F4A7C15L
      Array.tabulate(dim) { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        (((h >>> 40) & 0xffff).toInt + 1).toFloat
      }
    }
    println(s"[2lb] k=$k dim=$dim (${k.toLong * dim * 4 / (1 << 20)} MB of centroids)")
    for (arm <- Seq("full", "sampled"); run <- 1 to 2) {
      val fit = if (arm == "full") Int.MaxValue else 131072
      val t0 = System.nanoTime()
      val (coarse, cellStart, fineIds, _) =
        Similarity.buildTwoLevelCodebook(ids, vecs, fit)
      val wall = (System.nanoTime() - t0) / 1e9
      require(fineIds.length == k && fineIds.toSet.size == k,
        "CSR must hold every centroid exactly once")
      require(cellStart.last == k && cellStart.sliding(2).forall(p => p(0) <= p(1)),
        "cell starts must be monotone and cover k")
      println(f"[2lb] $arm%-8s run$run $wall%8.2f s (${coarse.length} cells)")
    }
  }
}
