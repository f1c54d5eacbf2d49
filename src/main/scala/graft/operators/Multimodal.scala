package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for training-data pipelines: images / audio / video as
 * opaque `binary` columns plus a typed metadata struct.
 *
 * The decode step is REAL for the formats the JDK ships codecs for —
 * PNG/JPEG/BMP/GIF via `javax.imageio` and 16-bit PCM WAV via
 * `javax.sound.sampled` (see [[MediaCodec]]) — run per row inside the
 * partition-parallel harness below: one JVM-side decode per row, batched per
 * partition, no driver involvement. Video keyframe extraction stays a
 * deterministic byte-slicer ([[frameSlices]]) because the JDK has no video
 * codec; its plumbing (schema, cardinality, partitioning) is identical to
 * what a real decoder would use.
 */
object Multimodal {

  /** Canonical metadata struct for a media column. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** Metadata struct column built from plain columns. */
  def withMediaMeta(
      mediaType: Column,
      width: Column,
      height: Column,
      durationMs: Column
  ): Column =
    struct(
      mediaType.cast(StringType).as("media_type"),
      width.cast(IntegerType).as("width"),
      height.cast(IntegerType).as("height"),
      durationMs.cast(LongType).as("duration_ms")
    )

  /** Cheap content fingerprint of a binary column (dedup key for media). */
  def mediaFingerprint(content: Column): Column = xxhash64(content)

  /** Byte size without materializing the payload anywhere else. */
  def mediaSize(content: Column): Column = length(content).cast(LongType)

  /**
   * Synthetic feature vector for payloads that have NO JVM decoder (e.g.
   * text-as-bytes, proprietary formats): `dim` deterministic hash-derived
   * floats in [-1, 1]. Fully codegen'd — stays inside whole-stage codegen,
   * unlike a decode that must leave the expression pipeline. For decodable
   * images use [[decodeImageFeatures]] instead.
   */
  def syntheticContentFeatures(content: Column, dim: Int): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(1000)).cast(DoubleType) / 500.0) - 1.0
    )

  /**
   * Deterministic keyframe slicer: "video" binary → up to `n` fixed-size
   * byte slices at even offsets. The JDK ships no video codec, so this is
   * the honest stand-in: output cardinality and schema (array<binary>,
   * length <= n) match a real keyframe extractor, and the real decoder
   * replaces only the slicing expression.
   */
  def frameSlices(content: Column, n: Int, frameBytes: Int = 64): Column =
    filter(
      transform(
        sequence(lit(0), lit(n - 1)),
        i => {
          val len = length(content)
          // integer stride — keeps frame offsets (and thus counts) exact
          // integer arithmetic, identical across engines for the oracle
          val step = greatest(floor(len / n).cast("int"), lit(1))
          val start = (i * step) + 1
          when(start <= len, substring(content, start, lit(frameBytes)).cast(BinaryType))
        }
      ),
      f => f.isNotNull
    )

  /** Sample-count estimate from payload size (for un-decoded audio). */
  def audioSampleEstimate(content: Column): Column =
    (length(content).cast(LongType) * 4)

  /** Output schema of [[decodeMediaMeta]]. */
  val DecodedMetaType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("dhash", LongType),
    StructField("duration_ms", LongType),
    StructField("rms_q", LongType)
  ))

  /**
   * REAL media decode over a binary column: images (PNG/JPEG/BMP/GIF) get
   * width/height/channels and a dHash perceptual fingerprint; WAV-PCM audio
   * gets channels, duration and quantized RMS energy; MP4 video containers
   * get width/height/duration from the box tree ([[MediaCodec
   * .decodeMp4Meta]] — `channels` carries the track count; frame decode
   * needs codecs this environment does not ship). One output row per input
   * row; runs partition-parallel with constant memory (one payload decoded
   * at a time per task).
   *
   * `kindCol` carries a MIME-ish hint (`image/ * `, `audio/ * `,
   * `video/ * `); rows whose payload fails to decode surface null metadata
   * rather than failing the job — at 100 TB a corrupt member must not kill
   * the pipeline.
   */
  def decodeMediaMeta(
      df: DataFrame,
      idCol: String,
      kindCol: String,
      contentCol: String
  ): DataFrame = {
    val in = df.select(
      col(idCol).cast(LongType),
      col(kindCol).cast(StringType),
      col(contentCol).cast(BinaryType)
    )
    processMediaPartitions(in, contentCol, DecodedMetaType) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        try {
          if (kind.startsWith("image/")) {
            val m = MediaCodec.decodeImage(bytes)
            Row(id, kind, m.width, m.height, m.channels, m.dhash64, null, null)
          } else if (kind.startsWith("audio/")) {
            val m = MediaCodec.decodeWavPcm(bytes)
            Row(id, kind, null, null, m.channels, null, m.durationMs, m.rmsQ)
          } else if (kind.startsWith("video/")) {
            val m = MediaCodec.decodeMp4Meta(bytes)
            // no visual track (audio-only .m4a tagged video/*): null
            // dimensions, matching the image/audio null-metadata convention
            val (w, h) = if (m.width > 0) (m.width, m.height) else (null, null)
            Row(id, kind, w, h, m.tracks, null, m.durationMs, null)
          } else Row(id, kind, null, null, null, null, null, null)
        } catch {
          case _: Exception => Row(id, kind, null, null, null, null, null, null)
        }
      }
    }
  }

  /** REAL image feature extraction: decode + 8x8 mean-gray grid → 64-dim
    * float vector in [0,1], a drop-in embedding column for the ANN/near-dup
    * operators ([[Similarity]]). Undecodable rows are dropped. */
  def decodeImageFeatures(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType))
    ))
    processMediaPartitions(in, contentCol, schema) { rows =>
      rows.flatMap { r =>
        try {
          val m = MediaCodec.decodeImage(r.getAs[Array[Byte]](1))
          Some(Row(r.getLong(0), m.grayFeatures.toSeq))
        } catch { case _: Exception => None }
      }
    }
  }

  /** REAL image resizing: binary column in, deterministically area-averaged
    * PNG thumbnails out ([[MediaCodec.resizeImage]]) — the normalization
    * step before feature extraction or storage. Map-only, constant memory
    * per task; undecodable rows are dropped. */
  def resizeImages(df: DataFrame, idCol: String, contentCol: String, w: Int, h: Int): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType)
    ))
    processMediaPartitions(in, contentCol, schema) { rows =>
      rows.flatMap { r =>
        try Some(Row(r.getLong(0), MediaCodec.resizeImage(r.getAs[Array[Byte]](1), w, h)))
        catch { case _: Exception => None }
      }
    }
  }

  /**
   * REAL video frame sampling at the CONTAINER level: the MP4 sample
   * tables ([[MediaCodec.mp4Samples]]) locate every frame's byte range,
   * pts, and sync flag; one frame per `everyMs` of presentation time is
   * selected (seek-to-previous; `keyframesOnly` restricts to sync samples)
   * and its payload sliced out as an opaque `binary` — codec decode of the
   * selected frames stays an external stage, exactly like a production
   * pipeline that ships sampled frames to a GPU decoder. Map-only and
   * constant-memory per row beyond the row's own bytes; undecodable or
   * table-less containers are dropped.
   */
  def sampleVideoFrames(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      everyMs: Long,
      keyframesOnly: Boolean = false
  ): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("pts_ms", LongType),
      StructField("keyframe", BooleanType),
      StructField("frame", BinaryType)
    ))
    processMediaPartitions(in, contentCol, schema) { rows =>
      rows.flatMap { r =>
        try {
          val bytes = r.getAs[Array[Byte]](1)
          MediaCodec
            .sampleFrameRefs(MediaCodec.mp4Samples(bytes), everyMs, keyframesOnly)
            .map { f =>
              Row(r.getLong(0), f.index, f.ptsMs, f.sync,
                java.util.Arrays.copyOfRange(
                  bytes, f.offset.toInt, (f.offset + f.size).toInt))
            }
        } catch { case _: Exception => Nil }
      }
    }
  }

  /** REAL audio segmentation: PCM WAV → fixed training windows
    * ([[MediaCodec.sliceWavSegments]]) as (id, seg_idx, start_ms, frames,
    * wav binary) — sample-exact slices re-encoded as standalone WAVs, the
    * audio leg of the frame-sampling family. Map-only; undecodable or
    * non-PCM rows are dropped. */
  def sliceAudioSegments(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      everyMs: Long,
      segmentMs: Long
  ): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("seg_idx", IntegerType),
      StructField("start_ms", LongType),
      StructField("frames", LongType),
      StructField("wav", BinaryType)
    ))
    processMediaPartitions(in, contentCol, schema) { rows =>
      rows.flatMap { r =>
        try {
          MediaCodec.sliceWavSegments(r.getAs[Array[Byte]](1), everyMs, segmentMs)
            .zipWithIndex.map { case ((startMs, frames, wav), i) =>
              Row(r.getLong(0), i, startMs, frames, wav)
            }
        } catch { case _: Exception => Nil }
      }
    }
  }

  /** REAL audio fingerprinting: PCM WAV → 64-bit loudness-envelope hash
    * ([[MediaCodec.audioEnvelopeHash64]]), a drop-in `hashCol` for
    * [[Dedup.dhashDups]] banded Hamming near-dup search — the audio leg of
    * the perceptual-dedup family. Undecodable rows are dropped. */
  def audioEnvelopeHashes(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("env_hash", LongType)
    ))
    processMediaPartitions(in, contentCol, schema) { rows =>
      rows.flatMap { r =>
        try Some(Row(r.getLong(0), MediaCodec.audioEnvelopeHash64(r.getAs[Array[Byte]](1))))
        catch { case _: Exception => None }
      }
    }
  }

  /**
   * Partition-parallel media batch processor: the `mapPartitions` harness
   * every decoder above plugs into. `process` sees one partition's rows as a
   * lazy iterator (constant memory). This is the Scala equivalent of the
   * `mapInPandas` batch shape a PySpark pipeline would use.
   */
  def processMediaPartitions(
      df: DataFrame,
      contentCol: String,
      outputSchema: StructType
  )(process: Iterator[Row] => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(df.rdd.mapPartitions(process), outputSchema)
  }
}
