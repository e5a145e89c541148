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
  * IMAGES decode for real: [[decodeImages]] runs JDK `javax.imageio`
  * (PNG/JPEG, zero external codecs) inside the mapPartitions boundary —
  * actual raster width/height, features average-pooled from actual pixels.
  * AUDIO decodes for real too: [[decodeAudio]] runs JDK
  * `javax.sound.sampled` over WAV/PCM bytes — actual sample rate, channel
  * count, frame length, features from actual amplitudes. VIDEO stays
  * behind the STUB boundary ([[decodeStub]]: deterministic fake features
  * from the bytes — the JDK ships no video codec); a production deployment
  * swaps `fakeDecode` for a JNI/codec call without touching the plan
  * shape. The decoders share output shape conventions, so everything
  * downstream (resize plan, frame sampling, the feature→ANN chain) is
  * agnostic to which produced the frame. (The reference has no media path
  * at all; this is a north-star extension per BASELINE.json.)
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

  /** Deterministic synthetic PNG: 8 vertical bands of solid grayscale.
    * cellW = (seed%4+1)·2 → width = 8·cellW ∈ {16,32,48,64};
    * height = seed%6+4; band i's gray value =
    * ((seed²+1)·(i³+7) + seed·91 + i·41) % 256 — NONLINEAR in the band
    * index on purpose: an affine-in-i rule makes every seed's 8-vector
    * near-collinear (all cross-seed cosines ≈ 1), which would trivialize
    * the near-dup fixture; the cubic mix decorrelates seeds (measured max
    * cross-seed cosine ≈ 0.9986 over 50 seeds).
    * PNG is lossless and equal-RGB grays survive decode untouched, so a
    * real decoder recovers every band value EXACTLY — which is what lets
    * an external oracle predict pixel-derived features arithmetically. */
  /** `pxScale` multiplies both dimensions (decode-cost knob for the media
    * growth axis — real crawl images cost ms, these band PNGs cost µs);
    * `uniquifier >= 0` paints its 8 bytes into the first 8 pixels of row 0
    * (distinct-payload knob: the band rule alone is periodic in
    * seed mod lcm(4, 6, 256) = 768, so at most 768 distinct payloads exist
    * without it). Defaults preserve the historical bytes EXACTLY — the
    * oracle-checked decode queries predict these pixels arithmetically. */
  def syntheticPng(seed: Long, pxScale: Int = 1,
                   uniquifier: Long = -1L): Array[Byte] = {
    val s = java.lang.Math.floorMod(seed, 256L * 256L) // keep the rule total
    val cellW = ((s % 4) + 1).toInt * 2 * pxScale
    val width = 8 * cellW
    val height = ((s % 6) + 4).toInt * pxScale
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < width) {
      val i = x / cellW
      val g = (((s * s + 1) * (i * i * i + 7) + s * 91 + i * 41) % 256).toInt
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < height) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    if (uniquifier >= 0) {
      var b = 0
      while (b < 8 && b < width) {
        val g = ((uniquifier >> (b * 8)) & 0xff).toInt
        img.setRGB(b, 0, (g << 16) | (g << 8) | g)
        b += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A media table of synthetic PNGs, one per id row, generated executor-
    * side (mapPartitions — the same boundary a fetch-from-blob-store fills
    * in production), then wrapped by [[asMedia]]. `seedMod > 0` collapses
    * seeds mod that value, making ids that share a residue carry IDENTICAL
    * images — the near-duplicate fixture knob. */
  def syntheticImageMedia(ids: DataFrame, idCol: String = "doc_id",
                          seedMod: Long = 0L, pxScale: Int = 1,
                          unique: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("png", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    val raw = graft.io.Sources
      .scatter(ids.select(col(idCol).cast("long").as("media_id")))
      .mapPartitions { rows =>
        // in-memory ImageIO for the ENCODE side too: ImageIO.write's
        // default file-backed stream cache puts a temp-file create/delete
        // inside every per-row PNG encode
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val seed = if (seedMod > 0) java.lang.Math.floorMod(id, seedMod)
                     else id
          // `unique` stamps the SEED into the payload, so the corpus has
          // exactly |distinct seeds| distinct payloads — the controlled
          // dup-factor knob the media growth axis needs (the band rule
          // alone is periodic mod 768)
          Row(id, syntheticPng(seed, pxScale,
            uniquifier = if (unique) seed else -1L))
        }
      }(enc)
    asMedia(raw, "media_id", "png", "image")
  }

  /** REAL image decode — JDK `javax.imageio`, no external codecs. PNG/JPEG
    * bytes → actual raster width/height plus an 8-dim feature vector: mean
    * luminance ((r+g+b)/3) over 8 vertical bands with floor boundaries
    * (band i spans columns [i·w/8, (i+1)·w/8)). Uniform-gray bands make
    * the mean an exact small integer — bit-reproducible through float, so
    * pixel-derived features can feed the oracle-checked ANN path exactly
    * like the stub's. Undecodable or null payloads yield a null-metadata
    * row, never an exception: one corrupt object must not kill a 100 TB
    * scan (the caller filters or routes them to quarantine). Stills have
    * n_frames = 1. */
  /** The per-payload pixel kernel shared by [[decodeImages]] and
    * [[decodeImagesDistinct]]: PNG/JPEG bytes → (width, height, band-mean
    * features), or None for null/undecodable payloads. */
  private def decodePixels(bytes: Array[Byte])
      : Option[(Int, Int, Array[Float])] = {
    val img =
      if (bytes == null) null
      else
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        // NonFatal, not just IOException: codec plugins throw
        // unchecked exceptions on malformed containers too
        catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val feats = new Array[Float](8)
      var band = 0
      while (band < 8) {
        val x0 = band * w / 8; val x1 = (band + 1) * w / 8
        var sum = 0.0d; var n = 0
        var x = x0
        while (x < x1) {
          var y = 0
          while (y < h) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3.0d
            n += 1; y += 1
          }
          x += 1
        }
        feats(band) = if (n == 0) 0f else (sum / n).toFloat
        band += 1
      }
      Some((w, h, feats))
    }
  }

  def decodeImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    graft.io.Sources.scatter(media.select("media_id", "modality", "content"))
      .mapPartitions { rows =>
        // in-memory ImageIO (the default temp-FILE cache would put a disk
        // write+read inside the per-row hot loop)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0); val modality = r.getString(1)
          decodePixels(r.getAs[Array[Byte]]("content")) match {
            case None => Row(id, modality, null, null, null, null)
            case Some((w, h, feats)) => Row(id, modality, w, h, 1, feats.toSeq)
          }
        }
      }(enc)
  }

  /** CONTENT-ADDRESSED image decode: decode each DISTINCT payload once and
    * join the result back to every media_id carrying it. On duplicate-heavy
    * corpora (crawl snapshots, re-hosted assets — dup factors of 2–100× are
    * normal at 100 TB) this turns N codec invocations into |distinct|, the
    * decode-side analogue of exact dedup. Mechanics and scale posture:
    *  - `dropDuplicates(content_hash)` keeps ONE payload per hash with a
    *    map-side partial aggregate, so the shuffle carries only the
    *    per-partition-distinct payloads (≤ data, → |distinct| when dups
    *    cluster), never the full corpus;
    *  - decode runs on the deduped side only — the expensive stage shrinks
    *    by the dup factor;
    *  - the join back is a plain equi-join on content_hash: AQE broadcasts
    *    the decoded side while it is small, degrades to a hash join when
    *    |distinct| grows — no plan cliff.
    * Same output schema and row grain as [[decodeImages]] (one row per
    * media_id, null metadata for undecodable payloads) — the two are
    * interchangeable, proven by DecodeDistinctParitySpec.
    *
    * The media frame is consumed TWICE (dedup+decode branch, join-back
    * branch). With a STORED content_hash (the normal media-table layout —
    * it is part of [[mediaSchema]] precisely so ingest materializes it
    * once) the second scan prunes to three cheap columns; a caller whose
    * media frame DERIVES content_hash on the fly (e.g. [[asMedia]] over
    * generated payloads) should stage the frame first, or the payload
    * production and hashing run once per branch. */
  def decodeImagesDistinct(media: DataFrame): DataFrame = {
    val repSchema = StructType(Seq(
      StructField("content_hash", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("feature", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(repSchema)
    val rep = graft.io.Sources.scatter(
        media.select("content_hash", "content")
          .dropDuplicates("content_hash"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          decodePixels(r.getAs[Array[Byte]]("content")) match {
            case None => Row(r.getString(0), null, null, null, null)
            case Some((w, h, feats)) =>
              Row(r.getString(0), w, h, 1, feats.toSeq)
          }
        }
      }(enc)
    // null-safe key: a null payload has a null content_hash (md5(null)),
    // and dropDuplicates keeps exactly one null-hash row whose decode is
    // the null-metadata row — `<=>` routes every null-payload media_id to
    // it, preserving decodeImages' one-row-per-media_id grain
    val m = media.select(col("media_id"), col("modality"),
      col("content_hash").as("mh"))
    m.join(rep, m("mh") <=> rep("content_hash"))
      .select(col("media_id"), col("modality"), col("width"), col("height"),
        col("n_frames"), col("feature"))
  }

  private val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("feature", ArrayType(FloatType)),
  ))

  /** Synthetic 8-bit mono PCM WAV (hand-rolled RIFF container — the format
    * is public and 44 bytes of header): 8 equal time bands, each holding a
    * constant amplitude from the same cubic seed-mix as [[syntheticPng]]
    * (affine-in-band rules would make every seed's vector near-collinear).
    * Constant bands mean a real decoder's per-band amplitude mean recovers
    * each value EXACTLY, so an external oracle can predict the
    * sample-derived features arithmetically. */
  def syntheticWav(seed: Long): Array[Byte] = {
    val s = java.lang.Math.floorMod(seed, 256L * 256L)
    val sampleRate = 8000 * ((s % 3) + 1).toInt
    val bandLen = (((s % 5) + 2) * 100).toInt
    val n = 8 * bandLen
    val out = new java.io.ByteArrayOutputStream(44 + n)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + n)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1) /* PCM */ ; le16(1) /* mono */
    le32(sampleRate); le32(sampleRate) /* byteRate */ ; le16(1); le16(8)
    out.write("data".getBytes("US-ASCII")); le32(n)
    var band = 0
    while (band < 8) {
      val v = (((s * s + 1) * (band * band * band + 7) + s * 91 + band * 41)
        % 256).toInt
      var i = 0
      while (i < bandLen) { out.write(v); i += 1 }
      band += 1
    }
    out.toByteArray
  }

  /** A media table of synthetic WAVs (executor-side generation, same
    * boundary as [[syntheticImageMedia]]). */
  def syntheticAudioMedia(ids: DataFrame, idCol: String = "doc_id",
                          seedMod: Long = 0L): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("wav", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    val raw = graft.io.Sources
      .scatter(ids.select(col(idCol).cast("long").as("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val seed = if (seedMod > 0) java.lang.Math.floorMod(id, seedMod)
                     else id
          Row(id, syntheticWav(seed))
        }
      }(enc)
    asMedia(raw, "media_id", "wav", "audio")
  }

  /** The JDK's registered audio-container readers, resolved ONCE per JVM.
    *
    * Why not `AudioSystem.getAudioInputStream` per row: that entry point
    * re-resolves the SPI provider list on EVERY call —
    * `JDK13Services.getProviders` takes a global lock and rescans the
    * classpath for service-config entries (measured r16 by in-task stack
    * sampling: 2,620 of ~2,700 samples inside
    * `JSSecurityManager.getProviders`/jar-entry scans, 32 decode tasks
    * serialized on the lock; multimodal_decode_audio reported 46 task-wall
    * seconds against 2 CPU seconds). Loading the
    * `javax.sound.sampled.spi.AudioFileReader` providers once and
    * dispatching directly is exactly the per-task-heavyweight-state rule
    * (optimization guide §4.5) — the SAME JDK codec classes AudioSystem
    * would pick run the actual parse. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toList
    // Probe MIDI readers LAST: SoftMidiAudioFileReader's PROBE internally
    // calls MidiSystem.getSequence, which re-runs the synchronized
    // JDK13Services classpath rescan per call — the very cost this cache
    // exists to hoist (stack-sampled r16: it dominated even with the
    // outer lookup cached, because JDK provider order puts it before
    // WaveFileReader). Container magics (RIFF/FORM/.snd/MThd) are
    // disjoint, so probe order cannot change which reader ACCEPTS.
    val (midi, rest) = all.partition(_.getClass.getName.contains("Midi"))
    rest ++ midi
  }

  /** AudioSystem.getAudioInputStream semantics over the cached provider
    * list: first reader that accepts the container wins; resettable
    * streams are rewound between probes exactly as AudioSystem does. */
  private def audioInputStreamCached(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val bais = new java.io.ByteArrayInputStream(bytes)
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(bais)
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          bais.reset()
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** REAL audio decode — JDK `javax.sound.sampled`, no external codecs.
    * WAV/PCM bytes → actual format metadata (sample rate, channels, frame
    * count) plus an 8-dim feature vector: mean amplitude over 8 equal time
    * bands (8-bit unsigned PCM → exact small integers through double, the
    * same bit-reproducibility contract as [[decodeImages]]). Undecodable
    * or null payloads yield a null-metadata row, never an exception — one
    * corrupt object must not kill a 100 TB scan. Tail samples beyond the
    * last full band fold into band 7 (n is a multiple of 8 for the
    * synthetic fixtures, so the fixture bands are exact). */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedAudioSchema)
    graft.io.Sources.scatter(media.select("media_id", "modality", "content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val modality = r.getString(1)
          val bytes = r.getAs[Array[Byte]]("content")
          val decoded =
            if (bytes == null) null
            else
              try {
                val in = audioInputStreamCached(bytes)
                val fmt = in.getFormat
                val data = in.readAllBytes()
                (fmt.getSampleRate.toInt, fmt.getChannels,
                  in.getFrameLength.toInt, data)
              } catch { case scala.util.control.NonFatal(_) => null }
          if (decoded == null) Row(id, modality, null, null, null, null)
          else {
            val (rate, ch, nFrames, data) = decoded
            val n = data.length
            val feats = new Array[Float](8)
            if (n > 0) {
              val bandLen = n / 8
              var band = 0
              while (band < 8) {
                val i0 = band * bandLen
                val i1 = if (band == 7) n else (band + 1) * bandLen
                var sum = 0.0d; var i = i0
                while (i < i1) { sum += (data(i) & 0xff); i += 1 }
                feats(band) = if (i1 == i0) 0f else (sum / (i1 - i0)).toFloat
                band += 1
              }
            }
            Row(id, modality, rate, ch, nFrames, feats.toSeq)
          }
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
