package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.chain.MetadataChain
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MetadataEvent.{CheckpointRef, ExecuteTransform, SetDataSchema, TransformInputState}
import graft.model.Op
import graft.operators.{MergeStrategy, Writer}

/**
 * Continuous derivative transforms: a dataset consumed as a stream, a
 * transform applied per micro-batch, and each batch committed as an
 * `ExecuteTransform` block that records (a) the input offset interval it
 * consumed, (b) the output slice, and (c) the content-hashed checkpoint
 * artifact — the reference's `Checkpoint` in ExecuteTransform
 * (dtos_generated.rs:967,1199).
 *
 * Exactly-once across kill-and-resume: Spark's streaming checkpoint (under
 * the OUTPUT dataset's own `checkpoints/` dir, so the engine state ships
 * with the dataset) replays unprocessed input files only, and the chain-side
 * interval guard skips a micro-batch whose input offsets were already
 * committed — so a foreachBatch retry after a crash can never double-append.
 */
object StreamingTransform {

  /** Content hash of a checkpoint directory: SHA-256 over the sorted
    * (relative path, file SHA-256) pairs. Stable under listing order;
    * sensitive to any byte of engine state. Returns None when the dir does
    * not exist yet (first batch of a fresh query). */
  def hashCheckpointDir(fs: FileSystem, dir: Path): Option[CheckpointRef] = {
    if (!fs.exists(dir)) return None
    def walk(p: Path): Seq[Path] = {
      val st = fs.listStatus(p).sortBy(_.getPath.getName)
      st.flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s.getPath))
    }
    val files = walk(dir)
    val rootUri = dir.toUri.getPath
    val entries = files.map { f =>
      val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      (rel, MetadataChain.sha256HexOf(fs, f))
    }.sortBy(_._1)
    val digest = MetadataChain.sha256Hex(
      entries.map { case (r, h) => s"$r:$h" }.mkString("\n").getBytes("UTF-8"))
    val size = files.map(f => fs.getFileStatus(f).getLen).sum
    Some(CheckpointRef(dir.getName, digest, size))
  }

  /**
   * Commit one transformed micro-batch as an ExecuteTransform block.
   * `inputBatch` must still carry the input's offset column; its min/max
   * define the consumed interval. Returns None when the interval was already
   * committed (a replayed batch after crash-restart).
   */
  def commitBatch(
      output: Dataset,
      inputName: String,
      inputBatch: DataFrame,
      transformed: DataFrame,
      systemTime: Long,
      checkpointDir: Option[Path] = None
  ): Option[ExecuteTransform] = {
    val vocab = output.vocabulary
    val offCol = vocab.offsetColumn
    val bounds = inputBatch.agg(min(col(offCol)).as("lo"), max(col(offCol)).as("hi")).head()
    if (bounds.isNullAt(1)) return None // empty batch
    val hi = bounds.getLong(1)

    val prevHi = output.chain
      .lastExecuteTransform()
      .flatMap(_.inputs.find(_.datasetName == inputName))
      .flatMap(_.newOffset)
    if (prevHi.exists(_ >= hi)) return None // replayed batch -> skip

    val withOp =
      if (transformed.columns.contains(vocab.operationTypeColumn)) transformed
      else transformed.withColumn(vocab.operationTypeColumn, lit(Op.Append))
    val prevOffset = output.chain.lastOffset()
    val stamped = Writer.stampSystemColumns(withOp, new Timestamp(systemTime), None, vocab)
    val withOffsets = Writer.assignOffsets(
      Writer.normalizeTimestamps(stamped),
      MergeStrategy.totalOrder(stamped, vocab),
      startOffset = prevOffset.map(_ + 1).getOrElse(0L),
      vocab
    )

    val newData = IngestWriter.writeSliceFile(output.chain, withOffsets).map {
      case (file, physicalHash) =>
        val written = output.spark.read.parquet(file.toString)
        val (stats, logical) = Writer
          .computeStatsAndHash(written, output.chain.watermark().map(new Timestamp(_)), vocab)
          .get
        if (output.chain.schemaDdl().isEmpty)
          output.chain.append(SetDataSchema(written.schema.toDDL), systemTime)
        graft.model.MetadataEvent.AddData(
          prevOffset = prevOffset,
          offsetStart = stats.offsetStart,
          offsetEnd = stats.offsetEnd,
          numRecords = stats.numRecords,
          physicalHash = physicalHash,
          logicalHash = logical,
          newWatermark = stats.newWatermark.map(_.getTime)
        )
    }
    val ckpt = checkpointDir.flatMap(d => hashCheckpointDir(output.chain.fs, d))
    val event = ExecuteTransform(
      Seq(TransformInputState(inputName, prevHi, Some(hi))),
      newData,
      ckpt
    )
    output.chain.append(event, systemTime)
    Some(event)
  }

  /**
   * Start the continuous derivative query: input dataset as a file stream
   * over its committed slices → `transform` per micro-batch → chain commit.
   * The streaming checkpoint lives under the output dataset's
   * `checkpoints/transform-<queryName>` — restartable exactly-once with the
   * same queryName.
   */
  def start(
      output: Dataset,
      input: Dataset,
      transform: DataFrame => DataFrame,
      queryName: String = "graft-transform",
      clock: () => Long = () => System.currentTimeMillis()
  ): StreamingQuery = {
    val checkpoint = new Path(output.chain.checkpointsDir, s"transform-$queryName")
    val stream = StreamingOps.datasetStream(input)
    val inputName = input.name
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint.toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        commitBatch(output, inputName, batch, transform(batch), clock(), Some(checkpoint))
        ()
      }
      .queryName(queryName)
      .start()
  }
}
