package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point: d such that following the order-
  * `bits` Hilbert curve for d steps lands on (x & mask, y & mask).
  *
  * The locality-preserving twin of the Morton interleave
  * (graft.ext.Layout.zvalue2): consecutive d values are ALWAYS
  * Manhattan-adjacent cells (no Z-shaped jumps), so range-clustering
  * files by d gives strictly tighter per-file bounding boxes — fewer
  * false-positive file reads per predicate at the same file count. The
  * trade: d is iterative bit arithmetic (16 dependent rounds), not five
  * shift/mask steps — exactly the case for a codegen'd expression where
  * a SQL formulation would be a 16-round CTE chain (which is what the
  * DuckDB oracle does, pinning every round cross-engine).
  *
  * Standard xy2d: per bit-plane s (high→low), quadrant = (rx, ry)
  * contributes s²·((3·rx) ⊕ ry) steps, then the lower plane is rotated
  * into canonical orientation (flip+swap when ry = 0). Pure long
  * arithmetic — overflow-free for bits ≤ 31.
  */
case class Hilbert2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2 needs (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  private val n = 1L << bits

  override def nullSafeEval(xi: Any, yi: Any): Any = {
    var x = xi.asInstanceOf[Long] & (n - 1)
    var y = yi.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // flip (when rx = 1) then swap x/y
        val nx = if (rx == 1) n - 1 - y else y
        val ny = if (rx == 1) n - 1 - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val (x, y, d, s, rx, ry, nx, ny) =
        (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("d"),
          ctx.freshName("s"), ctx.freshName("rx"), ctx.freshName("ry"),
          ctx.freshName("nx"), ctx.freshName("ny"))
      s"""
         |long $x = $xc & ${n - 1}L;
         |long $y = $yc & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $nx = ($rx == 1L) ? (${n - 1}L - $y) : $y;
         |    long $ny = ($rx == 1L) ? (${n - 1}L - $x) : $x;
         |    $x = $nx; $y = $ny;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
