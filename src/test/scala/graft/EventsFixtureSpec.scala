package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards [[SparkEntry.events]] against testdata regenerations that change the
  * events table's physical `ts` encoding. The helper must key on the OBSERVED
  * schema and normalize every encoding to the same TimestampType instants:
  *   - BIGINT nanos (what TIMESTAMP(NANOS) parquet reads as under
  *     spark.sql.legacy.parquet.nanosAsLong),
  *   - TIMESTAMP_NTZ micros (TIMESTAMP(MICROS, isAdjustedToUTC=false) — the
  *     round-7 regeneration that broke 10 correctness entries),
  *   - TIMESTAMP micros with UTC adjustment (instant-typed).
  */
class EventsFixtureSpec extends SparkSpec {

  /** One reference instant, expressed per-encoding below. */
  private val isoTs = Seq("2024-03-01T06:30:00Z", "2024-03-02T18:45:30Z")

  private def baseDf = {
    import spark.implicits._
    Seq(
      (1L, isoTs(0), 10L, "click", 1.5, """{"k":1}"""),
      (2L, isoTs(1), 20L, "view", 2.5, """{"k":2}""")
    ).toDF("event_id", "iso", "user_id", "event_type", "value", "props")
  }

  private def writeAndRead(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-events-fixture-").toString
    encode(baseDf).drop("iso").write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.events(spark, dir)
  }

  private def expectedMicros: Seq[Long] =
    isoTs.map(s => java.time.Instant.parse(s).toEpochMilli * 1000L)

  private def observedMicros(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy("event_id")
      .select(unix_micros(col("ts")))
      .collect()
      .toSeq
      .map(_.getLong(0))

  test("nanos-as-long encoding normalizes to TimestampType micros") {
    val df = writeAndRead(
      _.withColumn("ts", (unix_micros(to_timestamp(col("iso"))) * 1000L).as("ts"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    assert(df.schema("ts").dataType == TimestampType)
    assert(observedMicros(df) == expectedMicros)
  }

  test("TIMESTAMP_NTZ micros encoding normalizes to TimestampType micros") {
    val df = writeAndRead(
      // session tz is UTC, so this cast makes the NTZ wall value equal the instant
      _.withColumn("ts", to_timestamp(col("iso")).cast(TimestampNTZType))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    assert(df.schema("ts").dataType == TimestampType)
    assert(observedMicros(df) == expectedMicros)
  }

  test("instant-typed TIMESTAMP encoding passes through unchanged") {
    val df = writeAndRead(
      _.withColumn("ts", to_timestamp(col("iso")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    assert(df.schema("ts").dataType == TimestampType)
    assert(observedMicros(df) == expectedMicros)
  }
}
