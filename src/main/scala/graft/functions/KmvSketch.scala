package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch as a typed Aggregator —
  * the third mergeable point on the repo's cardinality trade-off curve,
  * next to HLL++ (`a_approx_distinct`) and the exact bitmap
  * (`a_bitmap_distinct`). Unlike HLL, KMV is DETERMINISTIC given the hash
  * function and therefore cross-engine oracle-checkable bit-for-bit: the
  * k smallest distinct hash values of a set are a pure function of the
  * set, not of visit order, partitioning, or engine internals.
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"; Beyer et al. 2007 SIGMOD for the unbiased form): with
  * hashes uniform on [0, H), if the k-th smallest distinct hash is h_k,
  * the distinct count ≈ (k-1)·H / h_k, with relative standard error
  * ~ 1/√(k-2). When fewer than k distinct hashes exist the sketch holds
  * all of them and the count is EXACT (= state size).
  *
  * At 100 TB: the buffer is at most k longs, reduce is O(log k) search +
  * O(k) copy amortized over mostly-rejected inserts (once the buffer
  * saturates, a new hash is rejected with probability 1 − k/d), and merge
  * is a bounded sorted-union — so the exchange carries O(k) per partition
  * regardless of the column's cardinality, exactly the property that lets
  * a distinct-count run where groupBy-distinct cannot.
  */
final class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be at least 2, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)

  private def insert(b: Seq[Long], h: Long): Seq[Long] = {
    // saturated and not smaller than the current k-th minimum: reject in
    // O(1) — the common case once the sketch has seen ≫ k distincts
    if (b.length == k && h >= b.last) b
    else {
      val idx = search(b, h)
      if (idx < b.length && b(idx) == h) b // already present (set semantics)
      else {
        val grown = (b.take(idx) :+ h) ++ b.drop(idx)
        if (grown.length > k) grown.dropRight(1) else grown
      }
    }
  }

  /** Binary search: first index whose value is >= h. */
  private def search(b: Seq[Long], h: Long): Int = {
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def merge(a: Seq[Long], c: Seq[Long]): Seq[Long] =
    if (a.isEmpty) c
    else if (c.isEmpty) a
    else c.foldLeft(a)(insert) // bounded: ≤ k inserts of ≤ k-length state

  /** The sorted minima themselves — the caller derives the estimate, so
    * the sketch stays reusable (union cardinality = merge then estimate;
    * intersection via inclusion-exclusion on the same states). */
  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
