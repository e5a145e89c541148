package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator.
  *
  * At 100 TB you cannot groupBy-count a high-cardinality column to find
  * its frequent values — the full distinct set does not fit anywhere. The
  * MG sketch keeps at most `k` counters per partition, combines map-side
  * like any Aggregator buffer, and merges sketches associatively, so the
  * exchange carries O(k) state per partition instead of one row per
  * distinct value.
  *
  * Guarantee (Misra-Gries, and the mergeability result of Agarwal et al.,
  * "Mergeable Summaries"): for n processed rows, every reported count
  * undercounts its true frequency by at most n/(k+1), and any value with
  * true frequency > n/(k+1) is guaranteed to be reported. Exact counts
  * for the survivors can be recovered with one cheap second pass filtered
  * to the ≤ k candidates (the standard two-pass exact heavy-hitters
  * recipe). FrequentItemsSpec pins both bounds against exact counts.
  */
object FrequentItems {

  type Counters = Map[String, Long]

  def misraGries(k: Int): TypedColumn[String, Seq[(String, Long)]] = {
    require(k >= 1, s"k must be positive, got $k")
    new Aggregator[String, Counters, Seq[(String, Long)]] {

      override def zero: Counters = Map.empty

      override def reduce(b: Counters, item: String): Counters =
        b.get(item) match {
          case Some(c) => b.updated(item, c + 1)
          case None if b.size < k => b.updated(item, 1L)
          // full and unseen: decrement every counter (the item "cancels"
          // one occurrence of each tracked value), dropping zeros. The
          // O(k) rebuild here is amortized O(1)/row: each decrement-all
          // consumes k previously-added count units and total units ≤ n,
          // so at most n/k such rebuilds happen over the whole stream.
          case None => b.collect { case (i, c) if c > 1 => i -> (c - 1) }
        }

      override def merge(a: Counters, c: Counters): Counters = {
        val sum = (a.keySet ++ c.keySet).iterator
          .map(i => i -> (a.getOrElse(i, 0L) + c.getOrElse(i, 0L))).toMap
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from everything — the
          // standard mergeable-summaries reduction back to k counters
          val d = sum.values.toSeq.sortBy(-_).apply(k)
          sum.collect { case (i, cnt) if cnt - d > 0 => i -> (cnt - d) }
        }
      }

      override def finish(b: Counters): Seq[(String, Long)] =
        b.toSeq.sortBy { case (i, c) => (-c, i) }

      override def bufferEncoder: Encoder[Counters] =
        ExpressionEncoder[Counters]()
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        ExpressionEncoder[Seq[(String, Long)]]()
    }.toColumn
  }
}
