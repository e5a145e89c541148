package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // doc i has exactly (i % 7) + 1 tokens — known counts, varied sizes.
  private def docs = (0L until 200L).map { i =>
    (i, Seq.fill((i % 7).toInt + 1)("tok").mkString(" "))
  }.toDF("doc_id", "text")

  test("layout matches a sequential re-computation of concat-and-chunk") {
    val budget = 10
    val shards = 4
    val plan = Packing.packPlan(docs, budget, shards).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"),
        r.getAs[Long]("n_seqs")))).toMap
    // replay per shard: walk docs in id order, accumulate the token cursor
    val cursors = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (i <- 0L until 200L) {
      val n = (i % 7) + 1
      val shard = i % shards
      val start = cursors(shard)
      val end = start + n
      cursors(shard) = end
      val (s, nt, first, last, nseq) = plan(i)
      assert(s == shard && nt == n)
      assert(first == start / budget, s"doc $i seq_first")
      assert(last == (end - 1) / budget, s"doc $i seq_last")
      assert(nseq == last - first + 1 && nseq >= 1)
    }
  }

  test("intervals are gap-free: shard token totals equal the last doc's end") {
    val plan = Packing.packPlan(docs, budget = 16, shards = 3)
    val perShard = plan.groupBy("shard")
      .agg(sum("n_tokens").as("total"), max("seq_last").as("max_seq"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("total"),
        r.getAs[Long]("max_seq")))
    perShard.foreach { case (_, total, maxSeq) =>
      assert(maxSeq == (total - 1) / 16) // last sequence id covers token total
    }
  }

  test("deterministic under repartitioning; invalid budget rejected") {
    val a = Packing.packPlan(docs, 10, 4).orderBy("doc_id").collect().toSeq
    val b = Packing.packPlan(docs.repartition(13), 10, 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException](Packing.packPlan(docs, 0, 4))
    intercept[IllegalArgumentException](Packing.packPlan(docs, 10, 0))
  }
}
