package graft.streaming

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.functions._

class StreamAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "completely different content talking about spark query engines"),
    (4L, "short"), // |norm| < 8: unshingleable
  ).toDF("doc_id", "text")

  test("mapwise signatures equal the explode+groupBy formulation") {
    val mapwise = StreamAdmission.mapwiseSignatures(docs)
      .filter($"band".isNotNull)
      .as[(Long, Int, String)].collect().toSet
    val grouped = Dedup.minhashSignatures(docs)
      .as[(Long, Int, String)].collect().toSet
    assert(mapwise == grouped)
    assert(mapwise.exists(s => s._1 == 1L)) // non-degenerate
  }

  test("unshingleable docs surface as one NULL-band row, not silently drop") {
    val rows = StreamAdmission.mapwiseSignatures(docs)
      .filter($"doc_id" === 4L).collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2))
  }

  test("streaming admission equals the batch verdict") {
    // write the fixture as a parquet 'documents' table and run the real
    // AvailableNow stream against it: ids 0 mod 3 are the delta
    val dir = java.nio.file.Files.createTempDirectory("graft_adm").toString
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content talking about spark query engines"),
      (6L, "unmatched new arrival that resembles nothing currently stored"),
    ).toDF("doc_id", "text")
    fixture.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = StreamAdmission.runAvailableNow(spark, dir)
      .as[(Long, Boolean, Option[Long])].collect().toSeq
    // 3 duplicates stored copies 1 and 2 → rejected with min dup id 1;
    // 6 matches nothing → admitted
    assert(got == Seq((3L, false, Some(1L)), (6L, true, None)))
  }
}
