package graft.ext

import org.apache.spark.graphx.Graph

import graft.SparkSpec

/** Independent-implementation cross-check for the DataFrame connected
  * components: GraphX's Pregel-based ConnectedComponents (a separate
  * public implementation with a different execution model) must produce
  * the identical labeling on the same edge set. Both algorithms label each
  * vertex with the MIN vertex id reachable from it, so the outputs are
  * comparable exactly — not just as a partition refinement.
  *
  * This is the same two-implementations-agree evidence pattern as BpeSpec:
  * stronger than pinned expectations, because neither implementation's
  * quirks can leak into the other.
  */
class GraphXParitySpec extends SparkSpec {

  test("DataFrame CC labeling == GraphX CC on the minhash candidate graph") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001",
      "documents")
    val pairs = Dedup.minhashCandidates(docs)
      .select("doc_a", "doc_b").persist()

    val mine: Map[Long, Long] = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val edgeTuples = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.unpersist()
    assert(edgeTuples.nonEmpty, "fixture should yield candidate pairs")

    val graphx: Map[Long, Long] =
      Graph.fromEdgeTuples(sc.parallelize(edgeTuples.toSeq, 4), 0)
        .connectedComponents().vertices.collect()
        .map { case (v, c) => (v: Long) -> (c: Long) }.toMap

    assert(mine.keySet == graphx.keySet)
    assert(mine == graphx)
  }

  test("agrees on an adversarial long chain (diameter ≫ 1)") {
    import spark.implicits._
    // a 40-vertex path: worst case for label propagation round counts
    val chain = (0L until 39L).map(i => (i, i + 1))
    val pairs = chain.toDF("doc_a", "doc_b")
    val mine = Dedup.connectedComponents(pairs, maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val graphx = Graph.fromEdgeTuples(sc.parallelize(chain, 3), 0)
      .connectedComponents().vertices.collect()
      .map { case (v, c) => (v: Long) -> (c: Long) }.toMap
    assert(mine == graphx)
    assert(mine.values.toSet == Set(0L))
  }
}
