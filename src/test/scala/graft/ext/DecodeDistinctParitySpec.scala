package graft.ext

import graft.SparkSpec

/** decodeImagesDistinct must be a drop-in for decodeImages: same rows at
  * the same media_id grain on a corpus mixing heavy duplication, unique
  * payloads, a corrupt payload, and null payloads (whose content_hash is
  * null — the null-safe join's reason to exist). */
class DecodeDistinctParitySpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("media_id")),
        r.getAs[String]("modality"),
        Option(r.getAs[Integer]("width")),
        Option(r.getAs[Integer]("height")),
        Option(r.getAs[Integer]("n_frames")),
        Option(r.getAs[scala.collection.Seq[Float]]("feature"))
          .map(_.toList))
    }.sortBy(_._1).toList

  test("content-addressed decode equals per-row decode, nulls included") {
    // seeds 0..3 each duplicated 25×, seed 7 unique, plus two null
    // payloads and one corrupt payload
    val dup = (0L until 100L).map(i => (i, "image",
      Multimodal.syntheticPng(i % 4)))
    val rows = dup ++ Seq(
      (100L, "image", Multimodal.syntheticPng(7L)),
      (101L, "image", "corrupt bytes".getBytes("UTF-8")),
      (102L, "image", null.asInstanceOf[Array[Byte]]),
      (103L, "image", null.asInstanceOf[Array[Byte]]))
    val media = Multimodal.asMedia(
      rows.toDF("media_id", "modality", "content"),
      "media_id", "content", "image")
    val perRow = canon(Multimodal.decodeImages(media))
    val distinct = canon(Multimodal.decodeImagesDistinct(media))
    assert(perRow.size == 104 && distinct == perRow)
  }
}
