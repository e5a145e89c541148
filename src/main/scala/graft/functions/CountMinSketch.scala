package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed
  * [[Aggregator]] — the frequency-estimation member of the mergeable-sketch
  * family next to HLL++ (`a_approx_distinct`), Misra-Gries
  * (`FrequentItems`) and the KLL-style quantile sketch
  * (`a_approx_percentile`).
  *
  * Buffer = depth×width long matrix (flattened): `reduce` adds 1 to one
  * cell per row, `merge` is element-wise addition — associative and
  * commutative, so Spark computes map-side partials and the exchange moves
  * ONE fixed-size array per partition regardless of input size. That is
  * the whole 100 TB story: exact per-key counts of a high-cardinality key
  * cost a corpus-wide shuffle of every key; the sketch answers point
  * queries after a metadata-sized merge.
  *
  * Guarantees (standard): estimates never undercount; with width w the
  * overcount is ≤ ⌈e·N/w⌉ with probability 1−e^(−depth) over the hash
  * draw. Hashes here are FIXED (splitmix64 finalizer, row-salted), so for
  * a given dataset the bound either holds or not — deterministically;
  * both bounds are asserted in-plan as data (the `a_approx_distinct`
  * pattern).
  */
final class CountMinSketch(val depth: Int, val width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var r = 0
    while (r < depth) { b(r * width + CountMinSketch.cell(x, r, width)) += 1
      r += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** 0-based flat buffer indices probed for key `x` — one per row. For a
    * key known at plan-construction time these are plain Scala ints, so
    * the estimate is a codegen'd `element_at` chain with no SQL-side
    * hashing to keep in sync with the JVM's. */
  def probeIndices(x: Long): Seq[Int] =
    (0 until depth).map(r => r * width + CountMinSketch.cell(x, r, width))

  /** Point estimate from a sketch column: min over the probed cells. */
  def estimate(sketch: Column, x: Long): Column =
    least(probeIndices(x).map(i => element_at(sketch, i + 1)): _*)
}

object CountMinSketch {
  /** splitmix64 finalizer (public-domain constant mix), salted by row. */
  private[functions] def cell(x: Long, row: Int, width: Int): Int = {
    var z = x + (row + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, width.toLong).toInt
  }
}
