package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-similarity scalar functions (host surface the fuzzy
  * side of dedup scripts leans on), with DuckDB 1.0's exact semantics
  * pinned by oracle:
  *
  *  - `jaccard`: CHARACTER-SET Jaccard (multiplicity ignored —
  *    jaccard('aab','ab') = 1.0); empty arguments error.
  *  - `hamming`: mismatch count, equal non-zero lengths required
  *    (DuckDB's exact error texts).
  *  - `jaro_similarity`: standard Jaro, 0.0 when either side is empty
  *    (DuckDB returns 0 even for ''≍'' where the textbook says 1).
  *  - `jaro_winkler_similarity`: Winkler boost (prefix ≤ 4, p = 0.1)
  *    applied ONLY above the 0.7 Jaro threshold (pinned:
  *    jw('abcdxxxx','abcyyyyy') = jaro despite the shared prefix).
  *  - `damerau_levenshtein`: FULL Damerau (unrestricted transpositions:
  *    dl('ca','abc') = 2, not OSA's 3).
  *
  * All run as StaticInvoke — codegen-inlined static calls, no UDF
  * serialization, row-local (the shapes a 100 TB scan can afford).
  */
object StringSimilarity {

  def jaccardChars(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    if (sa.isEmpty || sb.isEmpty)
      throw new IllegalArgumentException(
        "Invalid Input Error: Jaccard Function: An argument too short!")
    val xs = sa.codePoints().toArray.toSet
    val ys = sb.codePoints().toArray.toSet
    (xs & ys).size.toDouble / (xs | ys).size
  }

  def hamming(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString
    val sb = b.toString
    if (sa.isEmpty || sb.isEmpty)
      throw new IllegalArgumentException(
        "Invalid Input Error: Mismatch Function: Strings must be of length > 0!")
    if (sa.length != sb.length)
      throw new IllegalArgumentException(
        "Invalid Input Error: Mismatch Function: Strings must be of equal length!")
    var i = 0
    var d = 0L
    while (i < sa.length) {
      if (sa.charAt(i) != sb.charAt(i)) d += 1
      i += 1
    }
    d
  }

  private def jaroImpl(sa: String, sb: String): Double = {
    if (sa.isEmpty || sb.isEmpty) return 0.0
    if (sa == sb) return 1.0
    val window = math.max(sa.length, sb.length) / 2 - 1
    val aMatch = new Array[Boolean](sa.length)
    val bMatch = new Array[Boolean](sb.length)
    var matches = 0
    var i = 0
    while (i < sa.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(sb.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && sa.charAt(i) == sb.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < sa.length) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (sa.charAt(i) != sb.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // DuckDB FLOORS the half-transposition count (t = mismatches/2
    // integer division) — pinned on the doc4/doc5 pair where the
    // mismatch count is odd (textbook t/2.0 reads 0.68448, DuckDB
    // 0.69023); even counts agree either way.
    val t = (transpositions / 2).toDouble
    (m / sa.length + m / sb.length + (m - t) / m) / 3.0
  }

  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroImpl(a.toString, b.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaroImpl(sa, sb)
    if (j <= 0.7) return j
    var prefix = 0
    val max = math.min(4, math.min(sa.length, sb.length))
    while (prefix < max && sa.charAt(prefix) == sb.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString
    val sb = b.toString
    val n = sa.length
    val m = sb.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    // Full Damerau-Levenshtein (the "da" alphabet-pointer formulation,
    // Lowrance & Wagner 1975): unlike the restricted OSA recurrence, a
    // transposed pair may have edits between its halves.
    val inf = n + m
    val h = Array.ofDim[Int](n + 2, m + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= n) { h(i + 1)(1) = i; h(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { h(1)(j + 1) = j; h(0)(j + 1) = inf; j += 1 }
    val da = scala.collection.mutable.HashMap.empty[Char, Int]
    (sa + sb).foreach(c => da(c) = 0)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = da(sb.charAt(j - 1))
        val j1 = db
        var cost = 1
        if (sa.charAt(i - 1) == sb.charAt(j - 1)) { cost = 0; db = j }
        h(i + 1)(j + 1) = math.min(
          math.min(h(i)(j) + cost, // substitute / match
            math.min(h(i + 1)(j) + 1, h(i)(j + 1) + 1)), // insert / delete
          h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)) // transpose
        j += 1
      }
      da(sa.charAt(i - 1)) = i
      i += 1
    }
    h(n + 1)(m + 1).toLong
  }
}
