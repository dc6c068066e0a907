package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: the 2-d Hilbert curve index d(x, y) for
  * `bits`-wide codes — the standard xy2d walk (one step per bit, most
  * significant first), as ONE codegen'd integer loop per row.
  *
  * Replaces [[graft.operators.HilbertCurve.withHilbert]]'s 10-step
  * column unroll (~60 stacked Project expressions): measured at sf0.1
  * (q253, round 12) the unrolled chain evaluated at ~10 µs/row — the
  * generated projection chain is too large to JIT, so the 600 k-row
  * materialization alone cost ~6 s of the query's 8.7 s. This loop is
  * a few hundred bytes of bytecode inside whole-stage codegen and
  * computes the identical recurrence (each iteration is verbatim step
  * i of [[graft.operators.HilbertCurve.steps]]: same SQL DIV/% ↔ Java
  * `/`/`%` truncate-toward-zero semantics, same operand order, pure
  * long arithmetic), so results are bit-identical to the unroll — the
  * DuckDB oracle keeps running the CTE chain text
  * ([[graft.operators.HilbertCurve.cteChain]]), and
  * HilbertCurveSpec pins expression == textbook loop on full grids.
  *
  * `bits` must be a foldable integer literal in [1, 20] (the
  * [[graft.operators.ZOrderLayout]] code-width contract). Null x or y
  * yields null, matching the unroll's CASE null propagation. */
case class HilbertIndex(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  private lazy val bits: Int = third.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => sys.error(s"graft_hilbert bits not an integer: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val xyOk = Seq(first, second).forall(_.dataType == LongType)
    val bitsOk = (third.dataType == IntegerType || third.dataType == LongType) &&
      third.foldable && {
        val b = third.eval()
        b != null && {
          val v = b match { case i: Int => i.toLong; case l: Long => l }
          v >= 1L && v <= 20L
        }
      }
    if (xyOk && bitsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_hilbert requires (bigint x, bigint y, foldable int bits in [1,20]), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  /** One xy2d step per bit, most-significant first — verbatim
    * [[graft.operators.HilbertCurve.steps]] arithmetic. */
  private def walk(x0: Long, y0: Long): Long = {
    var d = 0L
    var x = x0
    var y = y0
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x / s) % 2
      val ry = (y / s) % 2
      d += s * s * (3 * rx + (1 - 2 * rx) * ry)
      val xl = x % s
      val yl = y % s
      if (ry == 1) { x = xl; y = yl }
      else if (rx == 1) { x = s - 1 - yl; y = s - 1 - xl }
      else { x = yl; y = xl }
      i -= 1
    }
    d
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    walk(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val xl = ctx.freshName("xl")
      val yl = ctx.freshName("yl")
      s"""
         |long $d = 0L;
         |long $x = $a;
         |long $y = $b;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = ($x / $s) % 2L;
         |  long $ry = ($y / $s) % 2L;
         |  $d += $s * $s * (3L * $rx + (1L - 2L * $rx) * $ry);
         |  long $xl = $x % $s;
         |  long $yl = $y % $s;
         |  if ($ry == 1L) { $x = $xl; $y = $yl; }
         |  else if ($rx == 1L) { $x = $s - 1L - $yl; $y = $s - 1L - $xl; }
         |  else { $x = $yl; $y = $xl; }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex =
    copy(first = newFirst, second = newSecond, third = newThird)
}
