package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The de-collected fixture feed (round 18): each epoch frame must arrive
  * as exactly one micro-batch, in epoch order, with the same rows — the
  * contract the 12 streaming entry fixtures rely on for batch-id guards
  * and watermark sequencing.
  */
class EpochFeedSpec extends SparkSpec {

  test("feed: one micro-batch per epoch, in order, rows intact") {
    import spark.implicits._
    val epochs = Seq(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Seq((3L, "c")).toDF("id", "v"),
      Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "v"))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    val q = EpochFeed.feed(spark, epochs).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized {
          seen += ((id, df.collect().map(r => (r.getLong(0), r.getString(1))).toSet))
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    assert(seen.map(_._1).toSeq == Seq(0L, 1L, 2L), s"batch ids: $seen")
    assert(seen(0)._2 == Set(1L -> "a", 2L -> "b"))
    assert(seen(1)._2 == Set(3L -> "c"))
    assert(seen(2)._2 == Set(4L -> "d", 5L -> "e", 6L -> "f"))
  }

  test("runToParquet: commits every appended batch, read back exactly") {
    import spark.implicits._
    val epochs = Seq(
      (1 to 50).map(i => (i.toLong, s"x$i")).toDF("id", "v"),
      (51 to 80).map(i => (i.toLong, s"x$i")).toDF("id", "v"))
    val path = EpochFeed.runToParquet(
      EpochFeed.feed(spark, epochs).select(col("id"), upper(col("v")).as("v")))
    val got = spark.read.parquet(path).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (1 to 80).map(i => (i.toLong, s"X$i")).toSet)
  }
}
