package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs as a partition-batched map over the binary
  * column.
  *
  * The decode step itself is STUBBED (this environment ships no codec
  * libraries): [[decodeStub]] produces deterministic fake features derived
  * from the bytes. The Spark-side plumbing — schema shape, binary transport,
  * per-partition batching, feature-column output — is the real, tested part;
  * a production deployment swaps `fakeDecode` for a JNI/codec call without
  * touching the plan shape. (The reference has no media path at all; this is
  * a north-star extension per BASELINE.json.)
  *
  * Scale notes: payload bytes stay columnar parquet-binary end to end; the
  * decoder is a narrow mapPartitions (no shuffle); metadata-only queries
  * never touch the binary column thanks to parquet column pruning.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
  ))

  /** Wrap a binary (or castable) column as a media table with metadata. */
  def asMedia(df: DataFrame, idCol: String, contentCol: String,
              modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(contentCol).cast("binary").as("content"),
      length(col(contentCol).cast("binary")).cast("long").as("byte_len"),
      md5(col(contentCol).cast("binary")).as("content_hash"))

  private val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType)),
  ))

  /** Deterministic fake decode: metadata and an 8-dim feature vector from
    * the md5 digest bytes. Replace this body (only) with a real codec.
    * Feature components are INTEGER-valued floats (0..255): exact in both
    * float and double, so downstream dot products/LSH signs are
    * bit-reproducible in any engine — which is what lets the decoded
    * features feed the oracle-checked near-dup path. */
  private def fakeDecode(mediaId: Long, modality: String,
                         content: Array[Byte]): Row = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(if (content == null) Array.emptyByteArray else content)
    val len = if (content == null) 0 else content.length
    Row(mediaId, modality,
      (len * 7) % 640 + 1, (len * 13) % 480 + 1, len % 30 + 1,
      digest.take(8).map(b => (b & 0xff).toFloat).toSeq)
  }

  /** Partition-batched decode over the media table — the `mapInPandas`
    * equivalent in Scala: one iterator pass per partition, rows streamed,
    * nothing collected. The projected (id, modality, content) frame is
    * scattered first: decode is the CPU-heavy stage, and a single-file
    * input would otherwise run it on one core (scatter no-ops when the
    * source is already parallel). */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    graft.io.Sources.scatter(media.select("media_id", "modality", "content"))
      .mapPartitions { rows =>
        rows.map { r =>
          fakeDecode(r.getLong(0), r.getString(1),
            r.getAs[Array[Byte]]("content"))
        }
      }(enc)
  }

  /** Metadata-only projection (never reads payload bytes after pruning). */
  def metadata(media: DataFrame): DataFrame =
    media.select("media_id", "modality", "byte_len", "content_hash")

  /** Frame sampling: every `stride`-th frame index of each media item, with
    * a deterministic per-frame content hash (stub: real decoders hash the
    * decoded frame). Pure columnar explode — no UDF, codegen end to end;
    * at scale the per-frame fan-out happens executor-side after pruning to
    * (id, hash, n_frames). Frame count derives from byte_len exactly like
    * `fakeDecode` (`len % 30 + 1`). */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame =
    media.select(col("media_id"), col("content_hash"),
        ((col("byte_len") % 30) + 1).cast("int").as("n_frames"))
      .select(col("media_id"), col("content_hash"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        md5(concat(col("content_hash"), lit(":"), col("frame_idx")))
          .as("frame_hash"))

  /** Resize metadata: fit (width, height) into a bounding box preserving
    * aspect ratio. Width-limited when maxW·h ≤ maxH·w, else height-limited;
    * the scaled side is floor(x·max/side) — small exact integers through
    * one double division, identical in any engine. The actual pixel
    * resample lives behind the same decode stub boundary. */
  def resizePlan(decoded: DataFrame, maxW: Int = 224, maxH: Int = 224)
      : DataFrame = {
    val widthLimited = lit(maxW) * col("height") <= lit(maxH) * col("width")
    decoded.select(col("media_id"), col("width"), col("height"))
      .withColumn("out_w",
        when(widthLimited, lit(maxW))
          .otherwise(floor(col("width") * lit(maxH) / col("height")))
          .cast("int"))
      .withColumn("out_h",
        when(widthLimited,
          floor(col("height") * lit(maxW) / col("width")))
          .otherwise(lit(maxH))
          .cast("int"))
  }
}
