package graft.streaming

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Epoch-file-fed streaming fixtures (round 18, guide §5: the driver does no
 * data work). The previous fixture shape `.collect()`ed every event-grain
 * row of each epoch slice to the driver and pushed it through a
 * MemoryStream — bounded at sf0.1 (~10 MB) but unbounded with the scale
 * factor. Here each epoch slice is instead written executor-side as ONE
 * parquet file with strictly increasing modification times; a file-source
 * readStream over the directory with `maxFilesPerTrigger=1` then replays
 * exactly one epoch per micro-batch, oldest mtime first — the same ordered
 * batches (same batchIds, same row sets) the addData-per-epoch MemoryStream
 * produced, with zero data rows on the driver.
 *
 * Replay semantics: a file source never re-processes a listed file, so
 * entries that demonstrate crash-replay exactly-once keep doing it the way
 * they already do — by invoking the operator's apply*Batch body directly
 * with the (executor-resident) epoch frame and the replayed batchId.
 */
object EpochFeed {

  /** Write `epochs` as one parquet file each (mtime-ordered) and return a
    * streaming DataFrame that replays them one micro-batch per epoch, in
    * order. The declared read schema is `epochs.head.schema`, so every
    * epoch must share one column layout.
    */
  def feed(spark: SparkSession, epochs: Seq[DataFrame]): DataFrame = {
    require(epochs.nonEmpty, "epoch feed needs at least one epoch")
    val dir = Files.createTempDirectory("graft-epoch-feed-")
    epochs.zipWithIndex.foreach { case (df, i) => writeEpoch(dir, df, i) }
    spark.readStream
      .schema(epochs.head.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
  }

  /** Run a streaming frame to completion into a parquet file sink (the
    * de-collected analog of the memory sink: results stay executor/disk
    * resident) and return the data path to read the committed output from.
    * The sink's per-(batch, partition) output is compacted to one file
    * afterwards (guide §6): the raw sink leaves ~dozens of tiny files
    * whose open/list overhead the reading entry would pay on every run.
    */
  def runToParquet(out: DataFrame): String = {
    val root = Files.createTempDirectory("graft-epoch-sink-")
    val data = root.resolve("data").toString
    val q = out.writeStream
      .format("parquet")
      .option("path", data)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val compact = root.resolve("compact").toString
    out.sparkSession.read.parquet(data).coalesce(1)
      .write.mode("overwrite").parquet(compact)
    compact
  }

  /** One epoch -> one parquet file named for its position, mtime-stamped so
    * the file source's oldest-first ordering equals epoch order. The write
    * happens executor-side (a single task via coalesce(1)); the driver only
    * moves the finished file into place.
    */
  private def writeEpoch(dir: Path, df: DataFrame, i: Int): Unit = {
    val stage = dir.resolve(s".stage-$i")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }
      .getOrElse(sys.error(s"epoch $i: no part file under $stage"))
    val dst = dir.resolve(f"epoch-$i%05d.parquet")
    Files.move(part, dst)
    // Fixed, strictly increasing stamps: the file source orders by mtime
    // and a fast loop could otherwise write two epochs in one clock tick.
    Files.setLastModifiedTime(dst, FileTime.fromMillis(1600000000000L + i * 60000L))
    // Remove staging leftovers (_SUCCESS, .crc); hidden ".stage-*" dirs are
    // invisible to the file source either way.
    Files.walk(stage).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
