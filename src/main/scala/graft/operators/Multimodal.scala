package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for training-data pipelines: images / audio / video as
 * opaque `binary` columns plus a typed metadata struct. The Spark-side
 * plumbing — schema convention, partition-parallel batch iteration, stable
 * output shapes — is real and tested; the actual media decoding is STUBBED
 * (no image/audio codecs in this environment) behind deterministic fakes
 * that preserve every property the distributed plan cares about: output
 * cardinality, schema, and a content-derived value.
 *
 * On a real cluster the stubs swap for a codec call inside the same
 * `mapPartitions` loop (one JVM-side decode per row, batched per partition,
 * no driver involvement) — the plan shape does not change.
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
   * STUB image feature extractor: binary content → float feature vector of
   * `dim` elements. Deterministic fake features derived from content bytes —
   * real codec/decoder drops in at the marked line. Runs as one
   * partition-parallel pass (`mapPartitions` semantics via the expression
   * pipeline; no UDF object churn per row).
   */
  def imageFeaturesStub(content: Column, dim: Int): Column = {
    // STUB: replace `xxhash64(content, lit(i))`-derived values with a real
    // decode + embed call when codecs are available.
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(1000)).cast(DoubleType) / 500.0) - 1.0
    )
  }

  /**
   * STUB frame sampler: "video" binary → `n` fixed-size byte slices taken at
   * even offsets (stand-in for keyframe extraction; output cardinality and
   * schema match the real operator: array<binary> of length <= n).
   */
  def frameSampleStub(content: Column, n: Int, frameBytes: Int = 64): Column =
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

  /**
   * STUB audio feature: binary → (sample estimate, rms-like energy proxy).
   * Deterministic from content; same shape as a real loudness extractor.
   */
  def audioStatsStub(content: Column): Column =
    struct(
      (length(content).cast(LongType) * 4).as("est_samples"),
      (pmod(xxhash64(content), lit(10000)).cast(DoubleType) / 10000.0).as("energy")
    )

  /**
   * Partition-parallel media batch processor: the `mapPartitions` harness a
   * real decoder plugs into. `process` sees one partition's rows as a lazy
   * iterator (constant memory) and returns one output row per input row.
   * This is the Scala equivalent of the reference-north-star `mapInPandas`
   * batch shape.
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
