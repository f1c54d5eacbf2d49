package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MetadataEvent.AddData
import graft.operators.MergeStrategy

/**
 * Continuous ingest: a streaming DataFrame committed to an ODF dataset via
 * `foreachBatch` — the Structured Streaming analog of the reference's
 * polling/push ingest loop (polling_ingest_service_impl.rs:115) for sources
 * that arrive as streams (MQTT, Kafka, file streams).
 *
 * Exactly-once across restarts: the streaming checkpoint (stored under the
 * dataset's own `checkpoints/` dir — the ODF checkpoint artifact, SURVEY
 * §3.3) tracks source offsets, and batch idempotence is enforced by
 * recording the committed `batchId` in the slice's `sourceState`. A batch
 * replayed after a crash-restart is recognized and skipped, so the chain
 * never double-appends.
 */
object StreamingIngest {

  private val StatePrefix = "streamBatch="

  /** Highest batch id already committed to the chain, if any. */
  def lastCommittedBatch(ds: Dataset): Option[Long] =
    ds.chain
      .slices()
      .flatMap(_.sourceState)
      .filter(_.startsWith(StatePrefix))
      .map(_.stripPrefix(StatePrefix).toLong)
      .maxOption

  /**
   * Commit one micro-batch; no-op (None) when `batchId` was already
   * committed — the idempotence guard `foreachBatch` relies on.
   */
  def commitBatch(
      ds: Dataset,
      batch: DataFrame,
      strategy: MergeStrategy,
      batchId: Long,
      systemTime: Long
  ): Option[AddData] =
    if (lastCommittedBatch(ds).exists(_ >= batchId)) None
    else
      IngestWriter.writeBatch(
        ds,
        batch,
        strategy,
        systemTime,
        sourceState = Some(s"$StatePrefix$batchId")
      )

  /**
   * Start the continuous ingest query. `clock` supplies the system-time
   * stamp per batch (injectable for deterministic tests).
   */
  def start(
      ds: Dataset,
      stream: DataFrame,
      strategy: MergeStrategy,
      queryName: String = "graft-ingest",
      clock: () => Long = () => System.currentTimeMillis()
  ): StreamingQuery = {
    val checkpoint =
      new org.apache.hadoop.fs.Path(ds.chain.checkpointsDir, s"streaming-$queryName")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(ds, batch, strategy, batchId, clock())
        ()
      }
      .queryName(queryName)
      .start()
  }
}
