package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd |a ∩ b| over two ASCENDING-SORTED `array<bigint>` columns —
  * the allocation-free twin of `size(array_intersect(a, b))` for the
  * set-similarity verify joins, where the built-in allocates an
  * OpenHashSet AND materializes the intersection array per CALL (per
  * candidate pair) only to take its size. This two-pointer merge reads
  * both arrays once, allocates nothing, and returns the count directly;
  * on primitive `UnsafeArrayData` the generated loop is two `getLong`s
  * and compares per step.
  *
  * Semantics match `size(array_intersect)` exactly for the supported
  * inputs: the count is over DISTINCT common values (equal runs are
  * skipped on both sides), so duplicate elements cannot inflate it —
  * same dedup the built-in applies. Preconditions: elements must be
  * non-null (checked, throws), and each array must be sorted ascending
  * (callers use `array_sort`, or produce sorted arrays by
  * construction). Sortedness is checked best-effort for free inside the
  * merge — any descending step the two-pointer walk VISITS throws; a
  * disorder the walk skips over (possible when one side exhausts early)
  * is not detected, so sortedness remains the caller's contract.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<bigint> inputs, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var ia = 0; var ib = 0; var count = 0L
    var prevA = Long.MinValue; var prevB = Long.MinValue
    while (ia < na && ib < nb) {
      if (a.isNullAt(ia) || b.isNullAt(ib))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null element")
      val va = a.getLong(ia); val vb = b.getLong(ib)
      if (va < prevA || vb < prevB)
        throw new IllegalArgumentException(
          "sorted_intersect_count: input array not sorted ascending")
      prevA = va; prevB = vb
      if (va < vb) ia += 1
      else if (va > vb) ib += 1
      else {
        count += 1
        while (ia < na && !a.isNullAt(ia) && a.getLong(ia) == va) ia += 1
        while (ib < nb && !b.isNullAt(ib) && b.getLong(ib) == va) ib += 1
      }
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val pa = ctx.freshName("pa"); val pb = ctx.freshName("pb")
      val cnt = ctx.freshName("cnt")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0; int $ib = 0; long $cnt = 0L;
         |long $pa = Long.MIN_VALUE; long $pb = Long.MIN_VALUE;
         |while ($ia < $na && $ib < $nb) {
         |  if ($a.isNullAt($ia) || $b.isNullAt($ib)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: null element");
         |  }
         |  final long $va = $a.getLong($ia);
         |  final long $vb = $b.getLong($ib);
         |  if ($va < $pa || $vb < $pb) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: input array not sorted ascending");
         |  }
         |  $pa = $va; $pb = $vb;
         |  if ($va < $vb) { $ia++; }
         |  else if ($va > $vb) { $ib++; }
         |  else {
         |    $cnt++;
         |    while ($ia < $na && !$a.isNullAt($ia) && $a.getLong($ia) == $va) $ia++;
         |    while ($ib < $nb && !$b.isNullAt($ib) && $b.getLong($ib) == $va) $ib++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
