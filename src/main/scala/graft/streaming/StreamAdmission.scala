package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming new-batch admission against a STATIC corpus signature store —
  * the stream-side of `pipeline_incremental_ingest`'s daily shape: delta
  * documents ARRIVE (here: AvailableNow over the documents source), each
  * micro-batch's MinHash band signatures join the corpus store computed
  * once per snapshot, and every delta document gets an admit verdict.
  *
  * The join is stream-static, so the store never re-reads per trigger
  * beyond its plan (broadcast here — at 100 TB the store is the bucketed
  * (band, sig) table of `Dedup.incrementalCandidates`' scaladoc and the
  * join flips to a shuffle-free bucket join); admission state is per
  * micro-batch only — no watermark, no stream-stream state.
  */
object StreamAdmission {

  /** Row-local MinHash band signatures — the SAME (b=2, r=2) md5 family
    * as [[graft.ext.Dedup.minhashSignatures]], computed WITHOUT any
    * aggregation: the shingle set stays an array inside its row and each
    * band word is an `array_min` over a `transform`. Min over the
    * position multiset equals min over the shingle set, so the output is
    * definitionally identical to the explode+groupBy formulation
    * (StreamAdmissionSpec asserts it row-for-row) — and being a narrow
    * map it runs on a STREAM without a streaming aggregation. Documents
    * too short to shingle (|norm| < 8) emit one (id, NULL band) row so
    * downstream verdicts still see them; the groupBy formulation drops
    * them instead (callers there re-join against the corpus). */
  def mapwiseSignatures(docs: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    def mw(w: Int) = array_min(expr(
      s"transform(shs, sh -> cast(conv(substring(md5(sh), ${w * 8 + 1}, 8)" +
        s", 16, 10) as bigint))"))
    docs
      .select(col(idCol),
        graft.ext.TextAnalysis.normalize(col("text")).as("norm"))
      .withColumn("shs", when(length(col("norm")) >= 8, expr(
        "transform(sequence(1, length(norm) - 7, 4)," +
          " i -> substring(norm, i, 8))")))
      .withColumn("bands", when(col("shs").isNotNull, array(
        struct(lit(0).as("band"), concat_ws(":", mw(0), mw(1)).as("sig")),
        struct(lit(1).as("band"), concat_ws(":", mw(2), mw(3)).as("sig")))))
      .select(col(idCol), explode_outer(col("bands")).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Admission verdicts for the delta stream (doc_id ≡ 0 mod 3 plays the
    * arriving batch) against the static base store. Complete output mode:
    * the verdict aggregate is tiny (one row per delta doc). */
  def runAvailableNow(spark: SparkSession, dir: String): DataFrame =
    StreamConf.sized(spark) {
      val schema =
        graft.io.Sources.parquetSchema(spark, s"$dir/documents.parquet")
      val store = graft.ext.Dedup.minhashSignatures(
          spark.read.parquet(s"$dir/documents.parquet")
            .filter(col("doc_id") % 3 =!= 0))
        .select(col("band"), col("sig"), col("doc_id").as("dup_of"))
      val delta = spark.readStream.schema(schema)
        .parquet(s"$dir/documents.*")
        .filter(col("doc_id") % 3 === 0)
      val verdicts = mapwiseSignatures(delta)
        .join(broadcast(store), Seq("band", "sig"), "left")
        .groupBy(col("doc_id"))
        .agg(min(col("dup_of")).as("dup_of"))
        .select(col("doc_id"), col("dup_of").isNull.as("admitted"),
          col("dup_of"))
      val q = verdicts.writeStream.format("memory")
        .queryName("graft_streaming_admission")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table("graft_streaming_admission").orderBy("doc_id")
    }
}
