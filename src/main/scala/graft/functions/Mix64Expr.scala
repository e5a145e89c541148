package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Wraparound xor-multiply mixing over an `array<bigint>`:
  * out(i) = (in(i) ⊕ xorC) · mulC  in 64-bit modular arithmetic.
  *
  * Exists because ANSI mode (Spark 4 default) traps `*` overflow in SQL
  * expressions, but hash mixing REQUIRES wraparound — this is the
  * derive-a-hash-family step for the rolling-hash MinHash variant
  * (Dedup.minhashSignaturesRolling). JVM long arithmetic wraps natively in
  * both the interpreted and generated paths. */
case class Mix64Expr(child: Expression, xorC: Long, mulC: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull arrays are rejected: getLong on a null slot would
      // silently read 0 and fabricate a hash value.
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mix64 needs array<bigint> without null elements, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Long](a.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = (a.getLong(i) ^ xorC) * mulC
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (out, i) = (ctx.freshName("out"), ctx.freshName("i"))
      s"""
         |long[] $out = new long[$c.numElements()];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  $out[$i] = ($c.getLong($i) ^ ${xorC}L) * ${mulC}L;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
