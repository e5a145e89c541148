package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.ext.Dedup

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("upsertParquet: insert, update-wins-by-version, idempotent rerun") {
    val dir = Files.createTempDirectory("graft_upsert").resolve("t").toString
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "version")
    Sinks.upsertParquet(base, dir, Seq("id"), "version")
    assert(spark.read.parquet(dir).count() == 2)

    // update id=2, insert id=3
    val upd = Seq((2L, "b2", 2L), (3L, "c", 1L)).toDF("id", "v", "version")
    Sinks.upsertParquet(upd, dir, Seq("id"), "version")
    val after = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().toSet
    assert(after == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L)))

    // replaying the same updates must change nothing (rerun-safe, the
    // reference's missing upsert story)
    Sinks.upsertParquet(upd, dir, Seq("id"), "version")
    assert(spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().toSet == after)

    // same version on both sides: the update wins the tie
    val tie = Seq((1L, "a_new", 1L)).toDF("id", "v", "version")
    Sinks.upsertParquet(tie, dir, Seq("id"), "version")
    assert(spark.read.parquet(dir).filter($"id" === 1L)
      .select("v").as[String].head() == "a_new")
  }

  test("connectedComponents returns empty for an empty edge list (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("connectedComponents labels clusters with their min doc id") {
    // two chains: {1-2, 2-3} and {10-11}; singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a long chain") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.size == 20)
  }
}
