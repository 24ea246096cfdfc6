package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `len(x)` — ONE name across strings (characters), lists
  * (elements), and blobs (bytes), returning BIGINT. Spark splits this
  * across `length` (strings/binary, INT) and `size` (arrays, INT) and
  * `length` REJECTS arrays, so pasted DuckDB like `len(string_split(t,
  * ' '))` has no direct spelling; this expression dispatches on the
  * child's resolved type at plan time (static — the branch is baked
  * into codegen, no per-row type test).
  */
case class Len(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType | ArrayType(_, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"len requires string, binary, or array, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case ArrayType(_, _) => v.asInstanceOf[ArrayData].numElements().toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = (long) $c.numChars();"
      case BinaryType => s"${ev.value} = (long) $c.length;"
      case ArrayType(_, _) => s"${ev.value} = (long) $c.numElements();"
    })

  override protected def withNewChildInternal(newChild: Expression): Len =
    copy(child = newChild)

  override def prettyName: String = "len"
}

/** UTF8String-typed static bridges for StaticInvoke call sites (Spark
  * hands StringType arguments to StaticInvoke as UTF8String — a JDK
  * method like Pattern.quote(String) can't be invoked directly).
  */
object StringCompat {
  def regexQuoteUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(java.util.regex.Pattern.quote(s.toString))

  /** DuckDB's strip_accents (pinned on 1.0): NFD-decompose and drop
    * combining marks — â→a, ó→o — while NON-decomposable letters stay
    * (ß, æ, ł survive; DuckDB keeps them too). The input text returns
    * recomposed characters untouched, so normalize back to NFC is not
    * needed: after mark-stripping the remainder is plain base letters.
    */
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{Mn}+", ""))

  /** DuckDB's nfc_normalize: Unicode NFC composition (e +  ́ → é). */
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Translate a C/Python strftime format (DuckDB's strftime/strptime
    * dialect) to the JVM DateTimeFormatter pattern Spark's
    * date_format/to_timestamp consume. Literal ALPHABETIC runs are
    * single-quoted (a bare `T` in `%Y-%m-%dT%H` is a pattern letter to
    * the JVM — the classic silent-corruption trap), `%%` is a literal
    * percent, `%-x` maps to the unpadded JVM form. Left = the offending
    * directive when a code has no JVM equivalent (caller raises a clear
    * error instead of formatting garbage).
    */
  def cFormatToJvm(fmt: String, forParse: Boolean = false): Either[String, String] = {
    val unpadded = Map('m' -> "M", 'd' -> "d", 'H' -> "H", 'I' -> "h",
      'M' -> "m", 'S' -> "s", 'j' -> "D")
    val padded = Map('Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM",
      'B' -> "MMMM", 'p' -> "a")
    // PARSING uses the single-letter JVM forms: they accept 1-2 digits,
    // matching strptime's lenient C semantics ('5:06' under %H:%M),
    // while the padded forms demand exactly two. Formatting keeps the
    // zero-padded output C produces.
    val map = if (forParse) padded ++ unpadded.map { case (k, v) => k -> v }
      else padded
    val sb = new StringBuilder
    var i = 0
    val n = fmt.length
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= n) return Left("%<end>")
        val d = fmt.charAt(i + 1)
        if (d == '%') { sb.append('%'); i += 2 }
        else if (d == '-') {
          if (i + 2 >= n) return Left("%-<end>")
          unpadded.get(fmt.charAt(i + 2)) match {
            case Some(p) => sb.append(p); i += 3
            case None => return Left(s"%-${fmt.charAt(i + 2)}")
          }
        } else map.get(d) match {
          case Some(p) => sb.append(p); i += 2
          case None => return Left(s"%$d")
        }
      } else if (c.isLetter || "[]#{}".indexOf(c) >= 0) {
        // Letters AND the formatter's reserved punctuation ([ ] open an
        // optional section — '[%H]' would silently eat the brackets —
        // and # { } throw 'reserved character' from deep inside the
        // formatter) are emitted as quoted literals.
        val start = i
        while (i < n && { val ch = fmt.charAt(i)
          ch.isLetter || "[]#{}".indexOf(ch) >= 0 }) i += 1
        sb.append('\'').append(fmt.substring(start, i)).append('\'')
      } else if (c == '\'') { sb.append("''"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    Right(sb.toString)
  }
}
