package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling hash over a string's UTF-8 bytes: the hash of every
  * `k`-byte window at `stride` offsets, as `array<bigint>`.
  *
  * Why a custom expression: the md5-per-shingle formulation (charShingles +
  * md5) costs O(n·k) digest work per document and materializes one row per
  * shingle before aggregating. The rolling formulation is O(n) — each
  * window hash derives from the previous in two multiplies — and emits one
  * compact array per document, no explode at all. For MinHash/fingerprint
  * pipelines over 100 TB of text this removes both the dominant CPU term
  * and the shingle-row shuffle.
  *
  * Arithmetic is 64-bit wraparound (base 257), identical in interpreted and
  * codegen paths and stable across platforms (JVM long semantics);
  * RollingHashSpec pins it against an independent reference implementation.
  * Not oracle-checked in DuckDB: SQL BIGINT overflow traps rather than
  * wrapping, so the md5 family remains the cross-engine-verified variant.
  */
case class RollingHashExpr(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {

  require(k > 0 && stride > 0, "window and stride must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"rolling_hash needs a string, got ${child.dataType.sql}")

  private val base = 257L

  /** base^(k-1) in wraparound arithmetic, for removing the outgoing byte. */
  private lazy val topPow: Long = {
    var p = 1L; var i = 1
    while (i < k) { p *= base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // emissions at offsets 0, stride, ..., ≤ n-k: exactly this many
    val out = new Array[Long]((n - k) / stride + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * base + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    var w = 1
    var s = 1
    while (s <= n - k) {
      h = (h - (bytes(s - 1) & 0xffL) * topPow) * base + (bytes(s + k - 1) & 0xffL)
      if (s % stride == 0) { out(w) = h; w += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (bytes, n, h, out, w, i, s) = (ctx.freshName("bytes"),
        ctx.freshName("n"), ctx.freshName("h"), ctx.freshName("out"),
        ctx.freshName("w"), ctx.freshName("i"), ctx.freshName("s"))
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |long[] $out;
         |if ($n < $k) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[($n - $k) / $stride + 1];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    $h = $h * ${base}L + ($bytes[$i] & 0xffL);
         |  }
         |  int $w = 0;
         |  $out[$w++] = $h;
         |  for (int $s = 1; $s <= $n - $k; $s++) {
         |    $h = ($h - ($bytes[$s - 1] & 0xffL) * ${topPow}L) * ${base}L
         |        + ($bytes[$s + $k - 1] & 0xffL);
         |    if ($s % $stride == 0) { $out[$w++] = $h; }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
