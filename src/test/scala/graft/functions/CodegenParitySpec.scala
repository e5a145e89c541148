package graft.functions

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Layout

/** Codegen-vs-interpreted parity for the custom expressions that did not
  * yet have a dedicated whole-stage-off twin (RollingHash and the vector
  * exprs have their own): a doGenCode whose generated Java diverges from
  * nullSafeEval is the classic custom-Expression failure mode, invisible
  * to oracle tests that only ever run one mode. Also pins the reference
  * semantics independently (a JVM-side Hilbert xy2d twin; mix64's
  * wraparound arithmetic). */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private def withWholeStage[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.sql.codegen.wholeStage", on.toString)
    try f
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  /** Scala twin of the standard xy2d walk (Hilbert2Expr scaladoc). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1); var y = y0 & (n - 1)
    var d = 0L; var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert2: codegen, interpreted, and JVM twin agree") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L),
      (1L << 30, (1L << 30) - 1)) // masked down by the expression
    val df = pts.toDF("x", "y")
    def run() = df
      .select(Layout.hvalue2(col("x"), col("y"), 16).as("d"))
      .as[Long].collect().toSeq
    val gen = withWholeStage(on = true)(run())
    val interp = withWholeStage(on = false)(run())
    val twin = pts.map { case (x, y) => xy2d(16, x, y) }
    assert(gen == interp, "codegen vs interpreted divergence")
    assert(gen == twin, "expression vs JVM reference divergence")
    // adjacency: consecutive d along the curve are Manhattan-adjacent —
    // the locality property the operator exists for (spot: first 64 steps)
    val d2xy = (0L until 64L).map(d =>
      (0 until 256).flatMap(x => (0 until 256).collect {
        case y if xy2d(8, x.toLong, y.toLong) == d => (x, y)
      }).head)
    d2xy.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent curve step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("mix64: codegen, interpreted, and wraparound arithmetic agree") {
    val xorC = 0x9E3779B97F4A7C15L
    val mulC = 0xBF58476D1CE4E5B9L
    val rows = Seq(Array(0L, 1L, -1L, Long.MaxValue, Long.MinValue),
      Array(42L), Array.empty[Long])
    val df = rows.toDF("a")
    def run() = df.select(GraftShims.column(
        Mix64Expr(GraftShims.expression(col("a")), xorC, mulC)).as("m"))
      .as[Seq[Long]].collect().toSeq
    val gen = withWholeStage(on = true)(run())
    val interp = withWholeStage(on = false)(run())
    val twin = rows.map(_.map(v => (v ^ xorC) * mulC).toSeq)
    assert(gen == interp, "codegen vs interpreted divergence")
    assert(gen == twin, "expression vs JVM wraparound divergence")
  }
}
