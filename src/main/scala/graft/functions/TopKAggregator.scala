package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (custom aggregate path — preference
  * order (b) in the build brief: Aggregator before custom physical plans).
  *
  * Why not a window: `row_number() OVER (PARTITION BY query)` must shuffle
  * every scored row to its query's reducers and sort there. An Aggregator
  * gets map-side PARTIAL aggregation: each scan partition reduces to at most
  * k rows per query before the exchange, so the shuffle carries
  * O(partitions × k) rows instead of O(corpus). At 100 TB of scored pairs
  * that is the difference between a broadcast-sized exchange and a full
  * re-shuffle of the corpus.
  *
  * Ordering: score DESC, then id ASC — the same total order every ranked
  * query in this repo uses, so results are deterministic and engine-
  * comparable.
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  /** score DESC (NaN ranks FIRST, matching Spark's ORDER BY cosine DESC,
    * where NaN sorts as the largest double — Ordering.by(-score) would
    * invert that, since -NaN is still NaN and sorts last), then id ASC. */
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    override def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score)
      if (c != 0) c else java.lang.Long.compare(x.id, y.id)
    }
  }

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.length >= k && ord.lteq(b.last, a)) b // fast path: can't enter
      else ((b :+ a).sorted(ord)).take(k)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopK = new TopK(k)
}
