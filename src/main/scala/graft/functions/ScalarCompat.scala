package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static codegen targets (StaticInvoke — inlined into whole-stage
  * codegen, no UDF boxing) for the round-16 scalar-parity pack: DuckDB
  * math/encoding scalars Spark lacks, each value-pinned against DuckDB
  * 1.0 in the q135 lane / SqlEntryPointsSpec.
  */
object ScalarCompat {

  /** Euclid; DuckDB gcd(0, 0) = 0, sign dropped. */
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  /** DuckDB lcm(): errors (not wraps) when the result leaves BIGINT —
    * multiplyExact/absExact surface the overflow the way DuckDB's
    * out-of-range error does instead of silently returning a wrapped
    * value.
    */
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0
    else
      try Math.absExact(Math.multiplyExact(a / gcd(a, b), b))
      catch {
        case _: ArithmeticException => throw new ArithmeticException(
          s"lcm($a, $b) is out of range for BIGINT")
      }

  /** DuckDB substring_grapheme (round 18): substring semantics over
    * GRAPHEME CLUSTERS (BreakIterator) instead of code units — 1-based
    * start, negative counts from the end, length clamps.
    */
  def substringGrapheme(s: org.apache.spark.unsafe.types.UTF8String,
      start: Long, len: Long): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    val it = java.text.BreakIterator.getCharacterInstance
    it.setText(str)
    val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
    var b = it.next()
    while (b != java.text.BreakIterator.DONE) { bounds += b; b = it.next() }
    val n = bounds.length - 1 // grapheme count
    if (len < 0) throw new IllegalArgumentException(
      "substring_grapheme: negative length")
    // DuckDB substring index semantics: 1-based; 0 acts like 1 with one
    // fewer kept char; negative counts from the end.
    var from = if (start > 0) start - 1 else if (start < 0) n + start else 0
    var count = if (start == 0 && len > 0) len - 1 else len
    if (from < 0) { count += from; from = 0 }
    if (from >= n || count <= 0)
      return org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    count = math.min(count, n.toLong) // pre-clamp: from + count can't overflow
    val to = math.min(n.toLong, from + count).toInt
    org.apache.spark.unsafe.types.UTF8String.fromString(
      str.substring(bounds(from.toInt), bounds(to)))
  }

  /** DuckDB's postfix `!` / factorial() semantics (round 18): n < 2 —
    * including NEGATIVE n — returns 1 (pinned on 1.0: (-1)! = 1), the
    * result is EXACT integer arithmetic (DuckDB computes in HUGEINT),
    * and overflow past the type's range errors instead of wrapping.
    * DECIMAL(38,0) holds 33! = 8.68e36; 34! ≈ 2.95e38 overflows it AND
    * DuckDB's HUGEINT (max 1.70e38) alike, so the two engines share the
    * exact domain 0..33.
    */
  def duckFactorial(n: Long): org.apache.spark.sql.types.Decimal = {
    if (n > 33) throw new ArithmeticException(
      s"factorial($n) is out of range (DuckDB's HUGEINT overflows at 34!)")
    var acc = java.math.BigInteger.ONE
    var i = 2L
    while (i <= n) { acc = acc.multiply(java.math.BigInteger.valueOf(i)); i += 1 }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(acc), 38, 0)
  }

  /** DuckDB even(): round AWAY from zero to the next even integer;
    * already-even integers stay (even(2.0) = 2, even(3.0) = 4,
    * even(-2.5) = -4).
    */
  def even(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return x
    val sign = if (x < 0) -1.0 else 1.0
    var v = math.ceil(math.abs(x))
    if (v % 2 != 0) v += 1
    sign * v
  }

  /** DuckDB to_base(n, radix): digits uppercased, no sign handling for
    * the pinned non-negative domain; minLength zero-pads on the left.
    */
  def toBase(n: Long, radix: Int, minLength: Int): UTF8String = {
    require(radix >= 2 && radix <= 36, s"to_base: radix $radix out of [2, 36]")
    val s = java.lang.Long.toString(n, radix).toUpperCase
    UTF8String.fromString(
      if (s.length >= minLength) s
      else ("0" * (minLength - s.length)) + s)
  }
  def toBase(n: Long, radix: Int): UTF8String = toBase(n, radix, 0)

  /** DuckDB unicode()/ord(): first CODE POINT (not UTF-16 unit); empty
    * string = -1, NULL handled by the null-safe invoke.
    */
  def unicodeCp(s: UTF8String): Int = {
    val str = s.toString
    if (str.isEmpty) -1 else str.codePointAt(0)
  }

  /** DuckDB format_bytes(): binary units, one decimal — pinned on 1.0:
    * format_bytes(0) = '0 bytes', (999) = '999 bytes', (1024) =
    * '1.0 KiB', (1536) = '1.5 KiB', (1048576) = '1.0 MiB', (-2048) =
    * '-2.0 KiB'; 1048575 renders '1024.0 KiB' (the divide stops at the
    * first unit whose quotient is < 1024 before rounding).
    */
  def formatBytes(n: Long): UTF8String = {
    val abs = math.abs(n.toDouble)
    if (abs < 1024) UTF8String.fromString(s"$n bytes")
    else {
      val units = Array("KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
      var v = abs
      var u = -1
      while (v >= 1024 && u < units.length - 1) { v /= 1024; u += 1 }
      val signed = if (n < 0) -v else v
      UTF8String.fromString(
        String.format(java.util.Locale.ROOT, "%.1f %s",
          Double.box(signed), units(u)))
    }
  }

  /** DuckDB century()/decade() on the extracted year (round 17;
    * positive-era formulas — the proleptic BC corner is not pinned).
    */
  def century(year: Int): Int = Math.floorDiv(year - 1, 100) + 1
  def decade(year: Int): Int = Math.floorDiv(year, 10)

  /** Γ(x) via the Lanczos approximation (g = 7, 9 coefficients — the
    * standard public-domain parameterization; ~1e-13 relative error on
    * the real line, reflection formula for x < 0.5). DuckDB's gamma()
    * comes from the C runtime's tgamma — agreement to ~12 significant
    * digits, so gate queries round.
    */
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def gammaFn(x: Double): Double =
    if (x.isNaN) x
    else if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * gammaFn(1.0 - x))
    else {
      val z = x - 1.0
      var a = lanczos(0)
      val t = z + 7.5
      var i = 1
      while (i < 9) { a += lanczos(i) / (z + i); i += 1 }
      math.sqrt(2.0 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * a
    }

  def lgammaFn(x: Double): Double = math.log(math.abs(gammaFn(x)))

  /** DuckDB datesub(part, start, end): COMPLETE calendar intervals
    * between two dates (datediff counts boundary CROSSINGS instead —
    * datesub('month', Jan 15, Mar 14) = 1 where datediff = 2, both
    * pinned on 1.0). ChronoUnit.between is exactly the complete-interval
    * contract. Date-resolution parts only; the sub-day parts ride the
    * epoch arithmetic the registration builds.
    */
  def dateSubDays(part: UTF8String, startDays: Int, endDays: Int): Long = {
    val s = java.time.LocalDate.ofEpochDay(startDays.toLong)
    val e = java.time.LocalDate.ofEpochDay(endDays.toLong)
    import java.time.temporal.ChronoUnit
    part.toString.toLowerCase match {
      case "year" | "years" | "y" => ChronoUnit.YEARS.between(s, e)
      case "quarter" | "quarters" => ChronoUnit.MONTHS.between(s, e) / 3
      case "month" | "months" | "mon" => ChronoUnit.MONTHS.between(s, e)
      case "week" | "weeks" | "w" => ChronoUnit.WEEKS.between(s, e)
      case "day" | "days" | "d" => ChronoUnit.DAYS.between(s, e)
      case other => throw new IllegalArgumentException(
        s"datesub: unsupported part '$other' for DATE inputs " +
          "(year/quarter/month/week/day)")
    }
  }

  /** DuckDB trunc(): toward zero, double-preserving. */
  def trunc(x: Double): Double =
    if (x < 0) math.ceil(x) else math.floor(x)

  /** DuckDB bar(x, min, max, width): a width-bounded block-character
    * gauge — full blocks plus one partial eighth block, the DuckDB
    * rendering (pinned: bar(5,0,10,10) = '█████').
    */
  def bar(x: Double, minV: Double, maxV: Double, width: Double): UTF8String = {
    // Host-probed (round-20 thirteenth sweep): eighths TRUNCATE (3.49
    // of 10 → ▍ = 3/8), and the result is space-padded until its UTF-8
    // BYTE length reaches `width` (each block char is 3 bytes, so
    // bar(3,0,10,10) is '███ ' — 9 bytes of blocks + 1 space), never
    // truncated when the blocks alone exceed it.
    val partials = Array("", "▏", "▎", "▍", "▌", "▋", "▊", "▉")
    val frac0 = if (maxV <= minV) 0.0 else (x - minV) / (maxV - minV)
    val frac = math.max(0.0, math.min(1.0, frac0))
    val bars = frac * width
    val full = bars.toInt
    val eighth = ((bars - full) * 8).toInt
    val sb = new java.lang.StringBuilder("█" * full + partials(eighth))
    var bytes = sb.length + 2 * (full + (if (eighth > 0) 1 else 0))
    while (bytes < width) { sb.append(' '); bytes += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** DuckDB yearweek(): ISO week-based year * 100 + ISO week. */
  def yearWeek(daysSinceEpoch: Int): Long = {
    val d = java.time.LocalDate.ofEpochDay(daysSinceEpoch.toLong)
    d.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR) * 100L +
      d.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR)
  }

  /** DuckDB millennium(): 3rd millennium = 2001-3000 (Postgres
    * convention, same shape as century/decade above).
    */
  def millennium(year: Int): Int = Math.floorDiv(year - 1, 1000) + 1

  // --- BIT lane (round 18). DuckDB's BIT (bitstring) modeled as its
  // VARCHAR form — a '0'/'1' string — which is exactly what CAST(b AS
  // VARCHAR) yields in DuckDB, so values round-trip the oracle compare.
  // get_bit/set_bit carry DuckDB's left-0-based indexing and its
  // out-of-range ERROR (not NULL); bitstring() pads with '0' on the
  // left to the requested width.

  /** BIT '...' literal validator: every char 0/1 (reference semantics:
    * DuckDB rejects other chars at parse).
    */
  def bitFromString(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c != '0' && c != '1')
        throw new IllegalArgumentException(
          s"Invalid character '$c' in BIT string literal (0/1 only)")
      i += 1
    }
    s
  }

  def getBit(s: UTF8String, idx: Int): Int = {
    val str = s.toString
    if (idx < 0 || idx >= str.length)
      throw new ArithmeticException(
        s"bit index $idx out of valid range (0..${str.length - 1})")
    if (str.charAt(idx) == '1') 1 else 0
  }

  def setBit(s: UTF8String, idx: Int, v: Int): UTF8String = {
    val str = s.toString
    if (idx < 0 || idx >= str.length)
      throw new ArithmeticException(
        s"bit index $idx out of valid range (0..${str.length - 1})")
    UTF8String.fromString(
      str.substring(0, idx) + (if (v == 0) '0' else '1') +
        str.substring(idx + 1))
  }

  /** DuckDB bitstring(str, len): left-pad with '0' to len; a len
    * shorter than the input errors (DuckDB: "length must be ...").
    */
  def bitstring(s: UTF8String, len: Int): UTF8String = {
    val str = bitFromString(s).toString
    if (len < str.length)
      throw new IllegalArgumentException(
        s"bitstring length $len is smaller than input length ${str.length}")
    UTF8String.fromString(("0" * (len - str.length)) + str)
  }

  // --- Path parsing (round 18, seventh sweep). DuckDB's parse_path
  // family, 'both'-separator mode (/ and \): the list keeps a leading
  // separator as its own '/' component; parse_dirname is the FIRST
  // component ('/' for absolute paths — pinned), parse_filename the
  // last, optionally extension-trimmed.

  private def pathParts(str: String): Array[String] = {
    val head =
      if (str.startsWith("/") || str.startsWith("\\"))
        Array(str.substring(0, 1))
      else Array.empty[String]
    head ++ str.split("[/\\\\]+").filter(_.nonEmpty)
  }

  def parsePath(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pathParts(s.toString).map(UTF8String.fromString(_: String))
        .asInstanceOf[Array[Any]])

  def parseFilename(s: UTF8String, trimExtension: Boolean): UTF8String = {
    val parts = pathParts(s.toString)
    if (parts.isEmpty) return UTF8String.fromString("")
    val f = parts.last
    UTF8String.fromString(
      if (trimExtension && f.lastIndexOf('.') > 0)
        f.substring(0, f.lastIndexOf('.'))
      else f)
  }

  def parseDirname(s: UTF8String): UTF8String = {
    val parts = pathParts(s.toString)
    UTF8String.fromString(if (parts.isEmpty) "" else parts.head)
  }

  /** DuckDB json_merge_patch: RFC 7386 — a non-object patch replaces
    * the target outright; object patches merge recursively with null
    * values REMOVING keys. Jackson (Spark's bundled JSON stack)
    * preserves insertion order, matching DuckDB's output ordering
    * (target keys first, new patch keys appended; pinned).
    */
  private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Out-of-range enum cast (round 18): DuckDB's conversion-error
    * shape. Always throws — the graft_enum CASE routes here only when
    * membership failed.
    */
  def enumConvertFail(v: UTF8String, name: UTF8String): UTF8String =
    throw new IllegalArgumentException(
      s"Conversion Error: Could not convert string '$v' to ENUM $name")

  /** json(s): validated minification — Jackson round-trip; DuckDB's
    * malformed-input error shape on bad input (round 18).
    */
  def jsonMinify(s: UTF8String): UTF8String =
    try UTF8String.fromString(
      jsonMapper.writeValueAsString(jsonMapper.readTree(s.toString)))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"Malformed JSON: ${s.toString.take(80)}", e)
    }

  def jsonValidCheck(s: UTF8String): Boolean =
    try { jsonMapper.readTree(s.toString); true }
    catch { case _: Exception => false }

  private def jsonTypeName(n: com.fasterxml.jackson.databind.JsonNode): String =
    if (n.isObject) "OBJECT"
    else if (n.isArray) "ARRAY"
    else if (n.isTextual) "VARCHAR"
    else if (n.isBoolean) "BOOLEAN"
    else if (n.isNull) "NULL"
    else if (n.isIntegralNumber)
      // bigIntegerValue, not asLong: integers above Long.MaxValue
      // (DuckDB's UBIGINT range) wrap/saturate under asLong and would
      // misreport the sign.
      { if (n.bigIntegerValue().signum() >= 0) "UBIGINT" else "BIGINT" }
    else "DOUBLE"

  /** json_type 1-arg: DuckDB's type-name vocabulary — non-negative
    * integers report UBIGINT, negative BIGINT (1.0-pinned).
    */
  def jsonTypeOf(s: UTF8String): UTF8String =
    UTF8String.fromString(jsonTypeName(jsonMapper.readTree(s.toString)))

  /** Minimal duck-JSONPath walker for the 2-arg forms: `$`, `.key`,
    * `[idx]` segments; any miss → null (DuckDB returns SQL NULL).
    */
  private def jsonAt(s: String, path: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    var n = jsonMapper.readTree(s)
    var p = path.trim
    if (p.startsWith("$")) p = p.substring(1)
    while (p.nonEmpty && n != null) {
      if (p.startsWith(".")) {
        var e = 1
        while (e < p.length && p.charAt(e) != '.' && p.charAt(e) != '[') e += 1
        n = if (n.isObject) n.get(p.substring(1, e)) else null
        p = p.substring(e)
      } else if (p.startsWith("[")) {
        val close = p.indexOf(']')
        if (close < 0) return null
        val idx = try p.substring(1, close).trim.toInt
          catch { case _: NumberFormatException => return null }
        n = if (n.isArray) n.get(idx) else null
        p = p.substring(close + 1)
      } else return null
    }
    n
  }

  def jsonTypeAt(s: UTF8String, path: UTF8String): UTF8String = {
    val n = jsonAt(s.toString, path.toString)
    if (n == null) null else UTF8String.fromString(jsonTypeName(n))
  }

  /** json_contains(haystack, needle): MySQL-style containment at any
    * subtree — object needles subset-match per key, array needles
    * element-subset-match, scalars match by node equality; the needle
    * may match anywhere in the haystack (1.0-pinned:
    * '{"x":1}' is contained in '{"a":{"x":1,"y":2}}').
    */
  def jsonContains(h: UTF8String, n: UTF8String): Boolean = {
    import com.fasterxml.jackson.databind.JsonNode
    val hay = jsonMapper.readTree(h.toString)
    val nee = jsonMapper.readTree(n.toString)
    def containedAt(t: JsonNode, c: JsonNode): Boolean =
      if (c.isObject)
        t.isObject && {
          val it = c.fields()
          var ok = true
          while (ok && it.hasNext) {
            val e = it.next()
            val tv = t.get(e.getKey)
            ok = tv != null && containedAt(tv, e.getValue)
          }
          ok
        }
      else if (c.isArray)
        t.isArray && {
          val it = c.elements()
          var ok = true
          while (ok && it.hasNext) {
            val ce = it.next()
            val te = t.elements()
            var hit = false
            while (!hit && te.hasNext) hit = containedAt(te.next(), ce)
            ok = hit
          }
          ok
        }
      else t == c
    def anywhere(t: JsonNode): Boolean =
      containedAt(t, nee) || {
        if (t.isContainerNode) {
          val it = t.elements()
          var hit = false
          while (!hit && it.hasNext) hit = anywhere(it.next())
          hit
        } else false
      }
    anywhere(hay)
  }

  def jsonMergePatch(a: UTF8String, b: UTF8String): UTF8String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    def merge(t: JsonNode, p: JsonNode): JsonNode =
      if (p == null || !p.isObject) if (p == null) p else p.deepCopy()
      else {
        val out: ObjectNode =
          if (t != null && t.isObject)
            t.deepCopy().asInstanceOf[ObjectNode]
          else jsonMapper.createObjectNode()
        val it = p.fields()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNull) { out.remove(e.getKey); () }
          else {
            out.set[ObjectNode](e.getKey,
              merge(out.get(e.getKey), e.getValue))
            ()
          }
        }
        out
      }
    UTF8String.fromString(jsonMapper.writeValueAsString(
      merge(jsonMapper.readTree(a.toString), jsonMapper.readTree(b.toString))))
  }

  // -----------------------------------------------------------------
  // DuckDB regexp options family (round 19): regexp_replace is
  // FIRST-match-only unless the options string carries 'g'; options
  // also apply to regexp_matches / regexp_extract[_all]. Replacement
  // backrefs are RE2 rewrites (\0 whole match, \1..\9 groups, \\ a
  // backslash, $ LITERAL) — not Java's $N. Patterns are thread-locally
  // cached (LRU 64): options are constants and patterns near-always
  // are, so the hot path compiles once per task thread.
  // -----------------------------------------------------------------

  private val rxCache: ThreadLocal[java.util.LinkedHashMap[String,
      java.util.regex.Pattern]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, java.util.regex.Pattern](
          16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.util.regex.Pattern]) =
          size() > 64
      })

  private def rxCompiled(p: String, flags: Int): java.util.regex.Pattern = {
    val key = flags.toString + "\u0000" + p
    val c = rxCache.get()
    var pat = c.get(key)
    if (pat == null) { pat = java.util.regex.Pattern.compile(p, flags); c.put(key, pat) }
    pat
  }

  /** DuckDB option chars → (Java flags, global). 'c' is the
    * case-sensitive default; 'm'/'n'/'p' (newline-sensitive) are Java's
    * default dot semantics already; unknown chars raise the host's
    * error; 'g' outside regexp_replace raises the host's targeted one.
    */
  private def rxOpts(opts: String, allowGlobal: Boolean): (Int, Boolean) = {
    var flags = 0; var global = false
    var i = 0
    while (i < opts.length) {
      opts.charAt(i) match {
        case 'c' | 'm' | 'n' | 'p' =>
        case 'i' => flags |= java.util.regex.Pattern.CASE_INSENSITIVE |
          java.util.regex.Pattern.UNICODE_CASE
        case 's' => flags |= java.util.regex.Pattern.DOTALL
        case 'l' => flags |= java.util.regex.Pattern.LITERAL
        case 'g' =>
          if (allowGlobal) global = true
          else throw new IllegalArgumentException(
            "Option 'g' (global replace) is only valid for regexp_replace")
        case c => throw new IllegalArgumentException(
          s"Unrecognized Regex option $c")
      }
      i += 1
    }
    (flags, global)
  }

  /** RE2 rewrite expansion into sb; false = invalid rewrite (lone or
    * unknown escape, group out of range) — RE2 then leaves the INPUT
    * unchanged, which the caller mimics.
    */
  private def rxExpand(rep: String, m: java.util.regex.Matcher,
      sb: java.lang.StringBuilder): Boolean = {
    var i = 0
    while (i < rep.length) {
      val c = rep.charAt(i)
      if (c == '\\') {
        if (i + 1 >= rep.length) return false
        val d = rep.charAt(i + 1)
        if (d == '\\') { sb.append('\\'); i += 2 }
        else if (d >= '0' && d <= '9') {
          val g = d - '0'
          if (g > m.groupCount()) return false
          val gv = m.group(g)
          if (gv != null) sb.append(gv)
          i += 2
        } else return false
      } else { sb.append(c); i += 1 }
    }
    true
  }

  /** DuckDB divide(): the // operator as a function — trunc integer
    * division on integral args, plain division on floats, NULL on a
    * zero divisor (host contract; ANSI Spark would error).
    */
  def duckDivideInt(a: Long, b: Long): java.lang.Long =
    if (b == 0L) null else java.lang.Long.valueOf(a / b)

  def duckDivideFloat(a: Double, b: Double): java.lang.Double =
    if (b == 0.0) null else java.lang.Double.valueOf(a / b)

  // --- Ninth-sweep scalars (round 19) --------------------------------

  /** RE2's QuoteMeta, DuckDB's regexp_escape: every ASCII char outside
    * [A-Za-z0-9_] gets a backslash; multibyte chars pass through.
    */
  def regexpEscape(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c >= 0x80) sb.append(c)
      else { sb.append('\\'); sb.append(c) }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def graphemeClusters(str: String): Array[Int] = {
    val it = java.text.BreakIterator.getCharacterInstance
    it.setText(str)
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = it.first()
    while (p != java.text.BreakIterator.DONE) { b += p; p = it.next() }
    b.toArray // boundaries incl. 0 and str.length
  }

  /** DuckDB left_grapheme / right_grapheme: count in GRAPHEME CLUSTERS;
    * negative n drops |n| clusters from the other end (the left()/
    * right() contract).
    */
  def leftGrapheme(s: UTF8String, n: Long): UTF8String = {
    val str = s.toString
    val b = graphemeClusters(str)
    val total = b.length - 1
    val take =
      if (n >= 0) math.min(n, total.toLong).toInt
      else math.max(0L, total + n).toInt
    UTF8String.fromString(str.substring(0, b(take)))
  }

  def rightGrapheme(s: UTF8String, n: Long): UTF8String = {
    val str = s.toString
    val b = graphemeClusters(str)
    val total = b.length - 1
    val take =
      if (n >= 0) math.min(n, total.toLong).toInt
      else math.max(0L, total + n).toInt
    UTF8String.fromString(str.substring(b(total - take)))
  }

  /** DuckDB length_grapheme: count of grapheme clusters. */
  def lengthGrapheme(s: UTF8String): Long =
    graphemeClusters(s.toString).length - 1L

  /** DuckDB chr(): the Unicode CODE POINT (Spark's chr is mod-256
    * Latin-1, a silent wrong value for any non-ASCII point — chr(8364)
    * must be '€'). Host errors on invalid points; out-of-range raises.
    */
  def duckChr(cp: Long): UTF8String = {
    if (cp < 0 || cp > 0x10FFFF || !Character.isValidCodePoint(cp.toInt))
      throw new IllegalArgumentException(s"chr: invalid code point $cp")
    UTF8String.fromString(new String(Character.toChars(cp.toInt)))
  }

  /** DuckDB left()/right() with NEGATIVE counts: drop |n| characters
    * from the other end (left('hello', -1) = 'hell'); Spark returns ''
    * for any negative n — a silent wrong value on pasted text. Counts
    * are in code points, matching the host.
    */
  def duckLeft(s: UTF8String, n: Long): UTF8String = {
    val total = s.numChars()
    val take =
      if (n >= 0) math.min(n, total.toLong).toInt
      else math.max(0L, total + n).toInt
    s.substring(0, take)
  }

  def duckRight(s: UTF8String, n: Long): UTF8String = {
    val total = s.numChars()
    val take =
      if (n >= 0) math.min(n, total.toLong).toInt
      else math.max(0L, total + n).toInt
    s.substring(total - take, total)
  }

  /** DuckDB's GLOB operator: case-sensitive glob match — `*` any run,
    * `?` one char, `[set]`/`[!set]` char classes with `-` ranges. A
    * trailing unclosed `[` matches nothing (host behavior on malformed
    * patterns is no-match, not an error).
    */
  def globMatch(s: UTF8String, pattern: UTF8String): Boolean = {
    val str = s.toString
    val pat = pattern.toString
    def matches(si: Int, pi: Int): Boolean = {
      var i = si; var j = pi
      var starI = -1; var starJ = -1
      while (i < str.length) {
        if (j < pat.length && (pat.charAt(j) == '?' ||
            pat.charAt(j) == str.charAt(i)) && pat.charAt(j) != '*' &&
            pat.charAt(j) != '[') {
          i += 1; j += 1
        } else if (j < pat.length && pat.charAt(j) == '[') {
          val close = pat.indexOf(']', j + 2) // ']' first in set is literal
          if (close < 0) return false
          val neg = pat.charAt(j + 1) == '!'
          val body = pat.substring(j + (if (neg) 2 else 1), close)
          var hit = false
          var k = 0
          while (k < body.length) {
            if (k + 2 < body.length && body.charAt(k + 1) == '-') {
              if (str.charAt(i) >= body.charAt(k) &&
                  str.charAt(i) <= body.charAt(k + 2)) hit = true
              k += 3
            } else {
              if (body.charAt(k) == str.charAt(i)) hit = true
              k += 1
            }
          }
          if (hit != neg) { i += 1; j = close + 1 }
          else if (starI >= 0) { starI += 1; i = starI; j = starJ }
          else return false
        } else if (j < pat.length && pat.charAt(j) == '*') {
          starI = i; starJ = j + 1; j += 1
        } else if (starI >= 0) {
          starI += 1; i = starI; j = starJ
        } else return false
      }
      while (j < pat.length && pat.charAt(j) == '*') j += 1
      j == pat.length
    }
    matches(0, 0)
  }

  /** DuckDB md5_number / md5_number_lower / md5_number_upper: the MD5
    * digest read LITTLE-ENDIAN as unsigned integers — lower = bytes
    * 8..16 as UBIGINT, upper = bytes 0..8, full = all 16 as HUGEINT.
    * Modeled as DECIMAL(20,0)/DECIMAL(38,0), the engine's unsigned
    * envelope.
    */
  private def md5LeUnsigned(s: UTF8String, from: Int, to: Int)
      : java.math.BigInteger = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes)
    var acc = java.math.BigInteger.ZERO
    var i = to - 1
    while (i >= from) {
      acc = acc.shiftLeft(8)
        .or(java.math.BigInteger.valueOf((d(i) & 0xff).toLong))
      i -= 1
    }
    acc
  }

  def md5NumberLower(s: UTF8String): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(md5LeUnsigned(s, 8, 16)), 20, 0)

  def md5NumberUpper(s: UTF8String): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(md5LeUnsigned(s, 0, 8)), 20, 0)

  /** Full 128-bit md5_number: DuckDB's HUGEINT — the digest little-
    * endian as a SIGNED two's-complement int128 (host-probed: values
    * with the top bit set print negative). 39 digits exceed
    * DECIMAL(38,0), so the engine carries the exact decimal DIGITS as
    * VARCHAR — value-identical, type-documented.
    */
  def md5Number(s: UTF8String): UTF8String = {
    var v = md5LeUnsigned(s, 0, 16)
    if (v.testBit(127)) v = v.subtract(java.math.BigInteger.ONE.shiftLeft(128))
    UTF8String.fromString(v.toString)
  }

  def duckRegexpReplace(s: UTF8String, p: UTF8String, r: UTF8String,
      opts: UTF8String): UTF8String = {
    val (flags, global) = rxOpts(opts.toString, allowGlobal = true)
    val input = s.toString
    val m = rxCompiled(p.toString, flags).matcher(input)
    val rep = r.toString
    val sb = new java.lang.StringBuilder
    var last = 0       // input copied through here
    var prevEnd = -1   // end of the previous REPLACED match
    var searchFrom = 0
    var done = false
    while (!done && searchFrom <= input.length && m.find(searchFrom)) {
      if (m.start() == m.end() && m.start() == prevEnd) {
        // RE2 skips an empty match abutting the previous match's end.
        searchFrom = m.end() + 1
      } else {
        sb.append(input, last, m.start())
        if (!rxExpand(rep, m, sb)) return s
        last = m.end(); prevEnd = m.end()
        searchFrom = if (m.end() == m.start()) m.end() + 1 else m.end()
        if (!global) done = true
      }
    }
    sb.append(input, last, input.length)
    UTF8String.fromString(sb.toString)
  }

  def duckRegexpMatches(s: UTF8String, p: UTF8String,
      opts: UTF8String): Boolean = {
    val (flags, _) = rxOpts(opts.toString, allowGlobal = false)
    rxCompiled(p.toString, flags).matcher(s.toString).find()
  }

  def duckRegexpExtract(s: UTF8String, p: UTF8String, group: Long,
      opts: UTF8String): UTF8String = {
    val (flags, _) = rxOpts(opts.toString, allowGlobal = false)
    val m = rxCompiled(p.toString, flags).matcher(s.toString)
    if (!m.find()) return UTF8String.EMPTY_UTF8
    val g = group.toInt
    if (g < 0 || g > m.groupCount()) throw new IllegalArgumentException(
      s"group index $g is out of range for pattern ${p.toString}")
    val gv = m.group(g)
    if (gv == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(gv)
  }

  def duckRegexpExtractAll(s: UTF8String, p: UTF8String, group: Long,
      opts: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (flags, _) = rxOpts(opts.toString, allowGlobal = false)
    val m = rxCompiled(p.toString, flags).matcher(s.toString)
    val g = group.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (m.find()) {
      if (g < 0 || g > m.groupCount()) throw new IllegalArgumentException(
        s"group index $g is out of range for pattern ${p.toString}")
      val gv = m.group(g)
      out += (if (gv == null) UTF8String.EMPTY_UTF8
        else UTF8String.fromString(gv))
      if (m.end() == m.start() && m.end() < s.toString.length) {
        // zero-width: Matcher.find() self-advances, nothing to do
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}
