package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * write-time file organization.
  *
  * Z-ordering (Morton order) interleaves the bits of several sort
  * dimensions so that range-partitioning files by ONE key keeps EVERY
  * dimension's per-file min/max narrow — which is what makes parquet
  * row-group/file skipping effective for predicates on any of the
  * clustered columns, not just the leading sort column. This is the
  * standard layout trick for 100 TB tables queried along several axes
  * (no single sort order can serve them all).
  *
  * The interleave uses the "binary magic numbers" bit-spread — five
  * shift/mask steps per dimension — entirely as built-in bitwise
  * Column expressions, so the whole key stays inside whole-stage
  * codegen (no UDF, no custom Expression needed).
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a long:
    * bit i of the input lands at bit 2i. */
  def spreadBits16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton key over the low 16 bits of two integer columns: x on
    * even bits, y on odd bits. Monotone in the interleaved ordering, so
    * `repartitionByRange(zvalue2(...))` range-clusters both dimensions
    * at once. */
  def zvalue2(x: Column, y: Column): Column =
    spreadBits16(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits16(y.cast("long")), 1))

  /** 2-D Hilbert key over the low 16 bits of two integer columns — the
    * locality-preserving alternative to [[zvalue2]]: consecutive keys are
    * always Manhattan-adjacent cells (LayoutSpec proves the walk), so
    * range-clustered files get strictly tighter bounding boxes than the
    * Morton order's Z-jumps allow. Codegen'd 16-round loop
    * ([[graft.functions.Hilbert2Expr]]). */
  def hvalue2(x: Column, y: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(graft.functions.Hilbert2Expr(
      GraftShims.expression(x.cast("long")),
      GraftShims.expression(y.cast("long")), bits))
  }

  /** Spread the low 16 bits of `c` every THIRD bit position (for 3-D
    * interleaving): bit i lands at bit 3i. Same magic-number technique,
    * different masks. */
  def spreadBits16x3(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 16))).bitwiseAND(lit(0x0000FF0000FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 8))).bitwiseAND(lit(0xF00F00F00F00FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 4))).bitwiseAND(lit(0x30C30C30C30C3L))
    (x3.bitwiseOR(shiftleft(x3, 2))).bitwiseAND(lit(0x9249249249249L))
  }

  /** 3-D Morton key over the low 16 bits of three integer columns. */
  def zvalue3(x: Column, y: Column, z: Column): Column =
    spreadBits16x3(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits16x3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spreadBits16x3(z.cast("long")), 2))

  /** Affine-scale a numeric column from [lo, hi] onto the full 16-bit
    * budget [0, 65535]. Interleaving only balances dimensions whose bit
    * widths are comparable — a 4-bit dimension zipped against an 8-bit
    * one contributes no high bits, and the z-order degenerates to
    * single-column order on the wider dimension. Production z-order
    * writers (Delta, Iceberg) do exactly this kind of per-dimension
    * normalization (range- or rank-based) before interleaving.
    *
    * Inputs are CLAMPED to [lo, hi] first: a value past the stated range
    * would otherwise scale beyond 16 bits and wrap through the
    * interleave masks — the largest value sorting as the smallest z-key,
    * silently landing in the wrong range partition and breaking min/max
    * file skipping (extreme values could even hit an ANSI multiply
    * overflow). Out-of-range rows cluster at the range edge instead,
    * which keeps the layout correct, merely less selective for them. */
  def normalize16(c: Column, lo: Long, hi: Long): Column = {
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    ((clamped - lit(lo)) * lit(65535L) / lit(math.max(hi - lo, 1L)))
      .cast("long")
  }

  /** Range-cluster a frame by the 2-D z-key of (x, y) into `numFiles`
    * output partitions — the write-side half of z-order data skipping.
    * Each output file then holds a z-range, i.e. a small rectangle (or
    * a few) in (x, y) space, so both x-predicates and y-predicates
    * prune files by footer min/max. Callers pass pre-normalized
    * columns (see [[normalize16]]) when the raw dimensions' bit widths
    * differ. */
  def clusterByZ2(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame =
    df.withColumn("__z", zvalue2(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
