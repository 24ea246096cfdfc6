package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Seeded fuzz of the bracket-syntax rewrite (sql/DuckLiteralRewrite)
  * against a Scala-side evaluator implementing the same pinned DuckDB
  * semantics (1-based index, negative-from-end, NULL at 0/out-of-bounds;
  * inclusive clamped slices with open ends) — the scanner is the most
  * intricate piece of the dialect layer, so random nesting of literals,
  * indexes, and slices guards its classification and receiver logic the
  * way MultimodalFuzzSpec guards the byte decoders.
  */
class DuckLiteralFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private sealed trait Ex
  private case class Lit(v: List[Int]) extends Ex
  private case class Idx(base: Ex, i: Int) extends Ex
  private case class Slc(base: Ex, lo: Option[Int], hi: Option[Int]) extends Ex

  private def render(e: Ex): String = e match {
    case Lit(v) => v.mkString("[", ", ", "]")
    case Idx(b, i) => s"(${render(b)})[$i]"
    case Slc(b, lo, hi) =>
      s"(${render(b)})[${lo.map(_.toString).getOrElse("")}:${hi.map(_.toString).getOrElse("")}]"
  }

  /** None = NULL; Left = scalar; Right = list. */
  private def eval(e: Ex): Option[Either[Int, List[Int]]] = e match {
    case Lit(v) => Some(Right(v))
    case Idx(b, i) => eval(b).flatMap {
      case Right(v) =>
        val n = v.length
        val p = if (i > 0 && i <= n) i else if (i < 0 && -i <= n) n + i + 1 else 0
        if (p == 0) None else Some(Left(v(p - 1)))
      case Left(_) => None // indexing a scalar: generator never does this
    }
    case Slc(b, lo, hi) => eval(b).map {
      case Right(v) =>
        val n = v.length
        val b0 = lo.getOrElse(1).toLong
        val e0 = hi.getOrElse(n).toLong
        val b1 = if (b0 < 0) n + b0 + 1 else b0
        val e1 = if (e0 < 0) n + e0 + 1 else e0
        val from = math.max(b1, 1L)
        val until = math.min(e1, n.toLong) + 1
        Right(if (until <= from) Nil
          else v.slice(from.toInt - 1, until.toInt - 1))
      case l => l
    }
  }

  test("random literal/index/slice trees match the Scala oracle") {
    val rnd = new scala.util.Random(20260814L)
    def gen(depth: Int): Ex = {
      val base: Ex =
        if (depth <= 0) Lit(List.fill(rnd.nextInt(5))(rnd.nextInt(90)))
        else rnd.nextInt(3) match {
          case 0 => Lit(List.fill(rnd.nextInt(5))(rnd.nextInt(90)))
          case 1 => Slc(gen(depth - 1),
            if (rnd.nextBoolean()) Some(rnd.nextInt(9) - 4) else None,
            if (rnd.nextBoolean()) Some(rnd.nextInt(9) - 4) else None)
          case _ => gen(depth - 1)
        }
      base
    }
    var checked = 0
    for (trial <- 0 until 120) {
      // A slice/literal tree, optionally index-capped (an index yields a
      // scalar, so it can only be outermost here).
      val listEx = gen(1 + rnd.nextInt(2))
      val ex: Ex =
        if (rnd.nextInt(3) == 0) Idx(listEx, rnd.nextInt(11) - 5) else listEx
      val sql = s"SELECT ${render(ex)} AS r"
      val row = spark.sql(sql).head()
      eval(ex) match {
        case None => assert(row.isNullAt(0), s"[$sql] expected NULL")
        case Some(Left(scalar)) =>
          assert(!row.isNullAt(0) && row.getInt(0) == scalar,
            s"[$sql] expected $scalar, got ${row.get(0)}")
        case Some(Right(list)) =>
          assert(row.getSeq[Int](0).toList == list,
            s"[$sql] expected $list, got ${row.get(0)}")
      }
      checked += 1
    }
    assert(checked == 120)
  }
}
