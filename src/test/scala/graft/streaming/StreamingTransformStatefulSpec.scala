package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MetadataEvent.SqlStep
import graft.operators.MergeStrategy
import graft.transform.TransformService

/** Stateful streaming transforms: Spark state-store continuity across
  * incremental pull runs via the recorded checkpoint artifact — the
  * reference's checkpointed-engine (Flink) story. The key assertion: a
  * window whose events SPAN TWO INPUT SLICES counts all of them, which is
  * only possible if run N resumed the aggregation state run N-1 left in the
  * checkpoint. */
class StreamingTransformStatefulSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  private val Steps = Seq(SqlStep(None,
    """SELECT window.start AS window_start, count(*) AS n, sum(v) AS total
      |FROM evsrc GROUP BY window(event_time, '1 hour')""".stripMargin))

  private def mkPair(tag: String): (Dataset, Dataset) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-ststream-$tag-")
    val src = Dataset.create(spark, root.resolve("src"), "evsrc", systemTime = 0L)
    val out = Dataset.create(spark, root.resolve("out"), "evagg", kind = "derivative", systemTime = 0L)
    TransformService.setTransform(out, Seq("evsrc"), Steps, systemTime = 1L,
      engine = Some("spark-streaming"))
    (src, out)
  }

  private def ingest(src: Dataset, time: Long, rows: (Timestamp, Long)*): Unit =
    IngestWriter.writeBatch(src, rows.toSeq.toDF("event_time", "v"),
      MergeStrategy.Append(), systemTime = time)

  private def run(out: Dataset, src: Dataset, time: Long): TransformService.TransformResult =
    TransformService.executeTransform(out, Map("evsrc" -> src), time)

  test("windows spanning slices aggregate across runs (state continuity)") {
    val (src, out) = mkPair("cont")

    // slice 1: two events in hour 10, one at 10:55
    ingest(src, 1000L,
      (t("2024-03-01T10:05:00Z"), 1L), (t("2024-03-01T10:15:00Z"), 2L),
      (t("2024-03-01T10:55:00Z"), 3L))
    val r1 = run(out, src, 2000L)
    // first run: watermark starts at -inf, nothing finalized — the event
    // records the interval + checkpoint, no data slice
    assert(r1.isInstanceOf[TransformService.Updated])
    val e1 = out.chain.lastExecuteTransform().get
    assert(e1.newData.isEmpty)
    assert(e1.newCheckpoint.isDefined, "checkpoint artifact must be recorded")
    assert(e1.inputs.head.newOffset === Some(2L))

    // slice 2: ANOTHER hour-10 event plus hour-11 events. Hour 10 is only
    // correct if the state from run 1 (3 events) survives into run 2.
    // Spark's no-data micro-batch applies the run's own watermark update, so
    // run 2 (max ts 11:40) flushes hour 10 (window end 11:00) WITHIN the run.
    ingest(src, 3000L,
      (t("2024-03-01T10:58:00Z"), 10L),
      (t("2024-03-01T11:20:00Z"), 4L), (t("2024-03-01T11:40:00Z"), 5L))
    val r2 = run(out, src, 4000L)
    assert(r2.isInstanceOf[TransformService.Updated])
    val afterR2 = out.toDF().orderBy("window_start")
      .select($"window_start", $"n", $"total").as[(Timestamp, Long, Long)].collect()
    assert(afterR2.toSeq === Seq((t("2024-03-01T10:00:00Z"), 4L, 16L)),
      s"hour-10 window must count events from BOTH slices: ${afterR2.mkString(",")}")

    // slice 3 (sentinel far future): watermark passes hour 11 -> it emits;
    // the sentinel's own window stays open forever (nothing later arrives)
    ingest(src, 5000L, (t("2024-04-09T00:00:00Z"), 0L))
    run(out, src, 6000L)
    val afterR3 = out.toDF().orderBy("window_start")
      .select($"window_start", $"n", $"total").as[(Timestamp, Long, Long)].collect()
    assert(afterR3.toSeq === Seq(
      (t("2024-03-01T10:00:00Z"), 4L, 16L),
      (t("2024-03-01T11:00:00Z"), 2L, 9L)))

    // nothing new -> UpToDate, no block appended
    val blocksBefore = out.chain.blockHashes().size
    assert(run(out, src, 9000L) === TransformService.UpToDate)
    assert(out.chain.blockHashes().size === blocksBefore)
  }

  test("verification checks engine state instead of batch replay; tamper detected") {
    val (src, out) = mkPair("verify")
    ingest(src, 1000L, (t("2024-03-01T10:05:00Z"), 1L))
    run(out, src, 2000L)
    ingest(src, 3000L, (t("2024-03-01T12:00:00Z"), 2L))
    run(out, src, 4000L)

    val resolve: String => Dataset = Map("evsrc" -> src)
    assert(graft.maintenance.Maintenance.verifyTransform(out, resolve).isEmpty)

    // tamper a state file: verification must flag the checkpoint hash
    val ckName = out.chain.lastExecuteTransform().get.newCheckpoint.get.name
    val ckDir = new org.apache.hadoop.fs.Path(out.chain.checkpointsDir, ckName)
    def firstFile(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path = {
      val st = out.chain.fs.listStatus(p).sortBy(_.getPath.getName)
      st.collectFirst { case s if s.isFile => s.getPath }
        .getOrElse(firstFile(st.head.getPath))
    }
    val victim = firstFile(ckDir)
    val o = out.chain.fs.create(victim, true)
    o.write("tampered".getBytes("UTF-8")); o.close()
    val issues = graft.maintenance.Maintenance.verifyTransform(out, resolve)
    assert(issues.exists(_.toString.contains("checkpoint")), issues.toString)
  }

  test("crash between streaming checkpoint and chain commit: staged output survives") {
    val (src, out) = mkPair("crash")
    ingest(src, 1000L, (t("2024-03-01T10:05:00Z"), 1L))
    run(out, src, 2000L)
    ingest(src, 3000L, (t("2024-04-01T00:00:00Z"), 0L)) // sentinel: hour 10 will emit
    run(out, src, 4000L)
    // simulate the crash: chain state rolled back to before the last commit
    // while the streaming checkpoint (and staged output) kept the progress.
    // Reproduce by parking staged output manually: move the emitted slice
    // back into the stage dir and reset the chain one block.
    // (Cheaper equivalent: assert the stage dir is empty after a clean
    // commit — the crash-resume path is the staleStage branch of
    // runStateful, exercised when stage files exist with no new input.)
    val stage = new org.apache.hadoop.fs.Path(out.chain.root, "scratch/stream-stage-decl")
    def stageEmpty() = !out.chain.fs.exists(stage) || out.chain.fs.listStatus(stage).isEmpty
    assert(stageEmpty(), "stage dir must be cleared after a committed run")
    // park a fake staged batch and verify the next run commits it even
    // though the input has nothing new
    val parked = spark.createDataFrame(
      Seq((t("2024-03-01T11:00:00Z"), 9L, 9L))).toDF("window_start", "n", "total")
    parked.write.parquet(new org.apache.hadoop.fs.Path(stage, "batch-99").toString)
    val r = run(out, src, 5000L)
    assert(r.isInstanceOf[TransformService.Updated])
    assert(out.toDF().filter($"n" === 9L).count() === 1,
      "staged output parked by a crashed run must be committed by the next run")
    assert(stageEmpty())
  }

  test("crash AFTER chain commit, before stage cleanup: parked batches are not re-committed") {
    val (src, out) = mkPair("crash2")
    ingest(src, 1000L, (t("2024-03-01T10:05:00Z"), 1L))
    run(out, src, 2000L)
    ingest(src, 3000L, (t("2024-04-01T00:00:00Z"), 0L)) // sentinel: hour 10 emits
    run(out, src, 4000L)
    val committedRows = out.toDF().count()
    assert(committedRows > 0)
    // simulate the crash window: the emitted batch is still parked in the
    // stage dir AND the _commit_intent marker points at the block that DID
    // commit it — exactly what a crash between append and delete leaves
    val stage = new org.apache.hadoop.fs.Path(out.chain.root, "scratch/stream-stage-decl")
    val emitted = out.toDF().drop("offset", "op", "system_time")
    emitted.write.parquet(new org.apache.hadoop.fs.Path(stage, "batch-7").toString)
    val (lastSeq, _) = out.chain.head.get
    val st = out.chain.lastExecuteTransform().get.inputs.head
    out.chain.writeObjectAtomic(
      new org.apache.hadoop.fs.Path(stage, "_commit_intent"),
      s"$lastSeq,${st.prevOffset.getOrElse("")},${st.newOffset.getOrElse("")}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // next run: nothing new on the input; the marker proves the parked
    // batch is already in the chain -> stage cleared, nothing appended
    val r = run(out, src, 5000L)
    assert(r === TransformService.UpToDate)
    assert(out.toDF().count() === committedRows, "no doubled emission")
    assert(!out.chain.fs.exists(stage) || out.chain.fs.listStatus(stage).isEmpty)
  }
}
