package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Op

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("corpus kernels run unchanged over a stream (quality gate on live docs)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    // the full map-side curation stage: stats kernels + repetition kernel +
    // PII scrub — pure expressions, so the streaming plan is identical to
    // the batch one (no state, no watermark needed)
    val curated = df.select(
        col("doc_id"),
        graft.operators.Corpus.scrubPii(col("text")).as("clean"),
        graft.functions.Text.qualityScore(col("text")).as("quality"),
        graft.operators.Corpus.repetitionStats(col("text")).as("r"))
      .filter(col("r.top2") < 0.9)
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "write bob@example.com a normal sentence about data engines"),
        (2L, "spam spam spam spam spam spam"),
        (3L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val rows = spark.table("curated")
        .select("doc_id", "clean").as[(Long, String)].collect().toMap
      assert(rows.keySet === Set(1L, 3L)) // doc 2 fails the repetition gate
      assert(rows(1L).contains("<EMAIL>") && !rows(1L).contains("bob@"))
      // streamed values are bit-identical to the batch evaluation
      val batch = Seq((1L, "write bob@example.com a normal sentence about data engines"))
        .toDF("doc_id", "text")
        .select(graft.functions.Text.qualityScore(col("text"))).head().getDouble(0)
      val streamed = spark.table("curated").filter(col("doc_id") === 1)
        .select("quality").head().getDouble(0)
      assert(batch === streamed)
    } finally q.stop()
  }

  test("tumbling window agg over a real stream (MemoryStream, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "k", "v")
    val agg = StreamingOps.tumblingWindowAgg(
      df,
      timeCol = "ts",
      windowDuration = "1 day",
      watermarkDelay = "0 seconds",
      keys = Seq(col("k")),
      aggs = Seq(sum(col("v")).as("total"), count(lit(1)).as("n"))
    )
    val q = agg.writeStream.format("memory").queryName("tumbled").outputMode("append").start()
    try {
      mem.addData(
        (t("2024-01-01T01:00:00Z"), "a", 1.0),
        (t("2024-01-01T02:00:00Z"), "a", 2.0),
        (t("2024-01-01T03:00:00Z"), "b", 5.0)
      )
      q.processAllAvailable()
      // advance the watermark past day 1 so its windows close and emit
      mem.addData((t("2024-01-03T00:00:00Z"), "a", 9.0))
      q.processAllAvailable()
      val got = spark
        .table("tumbled")
        .select(col("window.start").as("ws"), col("k"), col("total"), col("n"))
        .as[(Timestamp, String, Double, Long)]
        .collect()
        .toSet
      assert(
        got === Set(
          (t("2024-01-01T00:00:00Z"), "a", 3.0, 2L),
          (t("2024-01-01T00:00:00Z"), "b", 5.0, 1L)
        )
      )
    } finally q.stop()
  }

  test("dedupStream: within-horizon dups dropped, state evicts past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "id", "text")
    val deduped = StreamingOps.dedupStream(
      df, timeCol = "ts", watermarkDelay = "10 minutes",
      fingerprint = graft.functions.Text.fingerprint(col("text")))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def ids = spark.table("dedup_stream").select("id").as[Long].collect().toSet
      // same content twice in one batch: one admitted
      mem.addData(
        (t("2024-01-01T10:00:00Z"), 1L, "the same document"),
        (t("2024-01-01T10:00:00Z"), 2L, "the same document"),
        (t("2024-01-01T10:00:00Z"), 3L, "a different document"))
      q.processAllAvailable()
      assert(ids === Set(1L, 3L))
      // a later in-horizon duplicate is dropped (state still alive)
      mem.addData((t("2024-01-01T10:05:00Z"), 4L, "the same document"))
      q.processAllAvailable()
      assert(ids === Set(1L, 3L))
      // advance the watermark past the fingerprint's expiry (10:00+10m),
      // then the SAME content is admitted again: horizon semantics
      mem.addData((t("2024-01-01T10:30:00Z"), 5L, "watermark mover"))
      q.processAllAvailable()
      mem.addData((t("2024-01-01T10:25:00Z"), 6L, "the same document"))
      q.processAllAvailable()
      assert(ids === Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }

  test("stream-stream interval join emits matched pairs within the range") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(Long, Timestamp)]
    val ships = MemoryStream[(Long, Timestamp)]
    val joined = StreamingOps.intervalJoin(
      orders.toDF().toDF("order_id", "ots"),
      ships.toDF().toDF("ship_order_id", "sts"),
      leftWatermark = ("ots", "0 seconds"),
      rightWatermark = ("sts", "0 seconds"),
      keys = Seq(("order_id", "ship_order_id")),
      range = col("sts").between(col("ots"), col("ots") + expr("interval 2 days"))
    )
    val q = joined.writeStream.format("memory").queryName("shipped").outputMode("append").start()
    try {
      orders.addData((1L, t("2024-01-01T00:00:00Z")), (2L, t("2024-01-01T00:00:00Z")))
      ships.addData((1L, t("2024-01-02T00:00:00Z")), (2L, t("2024-01-05T00:00:00Z")))
      q.processAllAvailable()
      val got = spark.table("shipped").select("order_id").as[Long].collect().toSeq
      assert(got === Seq(1L)) // order 2 shipped outside the 2-day window
    } finally q.stop()
  }

  test("windowed agg over a joined stream (overdue-shipments composition)") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(Long, Timestamp)]
    val ships = MemoryStream[(Long, Timestamp)]
    val joined = StreamingOps.intervalJoin(
      orders.toDF().toDF("order_id", "ots"),
      ships.toDF().toDF("ship_order_id", "sts"),
      leftWatermark = ("ots", "0 seconds"),
      rightWatermark = ("sts", "0 seconds"),
      keys = Seq(("order_id", "ship_order_id")),
      range = col("sts").between(col("ots"), col("ots") + expr("interval 2 days"))
    )
    val agg = StreamingOps.tumblingWindowAgg(
      joined, "ots", "1 day", "", Seq(), Seq(count(lit(1)).as("shipped")))
    val q = agg.writeStream.format("memory").queryName("shipagg").outputMode("append").start()
    try {
      orders.addData((1L, t("2024-01-01T01:00:00Z")), (2L, t("2024-01-01T02:00:00Z")))
      ships.addData((1L, t("2024-01-02T00:00:00Z")), (2L, t("2024-01-01T12:00:00Z")))
      q.processAllAvailable()
      // push watermarks far enough to close the join state AND the window
      orders.addData((99L, t("2024-02-01T00:00:00Z")))
      ships.addData((98L, t("2024-02-01T00:00:00Z")))
      q.processAllAvailable()
      val got = spark.table("shipagg")
        .select(col("window.start").as("ws"), col("shipped"))
        .as[(Timestamp, Long)].collect().toMap
      assert(got(t("2024-01-01T00:00:00Z")) === 2L)
    } finally q.stop()
  }

  test("topN with retractions emits leaderboard changes as changelog rows") {
    // micro-batch 1: alice 10, bob 8, carol 5; top-2 = alice, bob
    val s1 = Seq(("alice", 10L), ("bob", 8L), ("carol", 5L)).toDF("player", "score")
    val d1 = StreamingOps.topNRetractions(
      prevLedger = None,
      currentState = s1,
      n = 2,
      scoreOrder = Seq(col("score").desc, col("player")),
      primaryKey = Seq("player")
    )
    val got1 = d1.select("op", "player", "place").as[(Int, String, Int)].collect().toSet
    assert(got1 === Set((Op.Append, "alice", 1), (Op.Append, "bob", 2)))

    // ledger = emitted rows with offsets; batch 2: carol overtakes bob
    val ledger1 = d1
      .withColumn("offset", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("player"))).cast("long"))
    val s2 = Seq(("alice", 10L), ("bob", 8L), ("carol", 12L)).toDF("player", "score")
    val d2 = StreamingOps.topNRetractions(
      prevLedger = Some(ledger1),
      currentState = s2,
      n = 2,
      scoreOrder = Seq(col("score").desc, col("player")),
      primaryKey = Seq("player")
    )
    val got2 = d2.select("op", "player", "place").as[(Int, String, Int)].collect().toSet
    // carol enters at place 1, alice corrected 1->2, bob retracted
    assert(
      got2 === Set(
        (Op.Append, "carol", 1),
        (Op.CorrectFrom, "alice", 1),
        (Op.CorrectTo, "alice", 2),
        (Op.Retract, "bob", 2)
      )
    )
  }

  test("datasetStream: committed slices arrive incrementally as streaming input") {
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.operators.MergeStrategy

    val root = java.nio.file.Files.createTempDirectory("graft-dstream-")
    val ds = Dataset.create(spark, root.resolve("src"), "src_ds", systemTime = 0L)
    IngestWriter.writeBatch(
      ds,
      Seq((t("2024-01-01T00:00:00Z"), "a", 1L)).toDF("event_time", "k", "v"),
      MergeStrategy.Append(), systemTime = 1000L)

    val stream = StreamingOps.datasetStream(Dataset.open(spark, root.resolve("src")))
    val q = stream
      .selectExpr("k", "v * 10 AS v10")
      .writeStream.format("memory").queryName("dstream_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dstream_out").count() === 1)
      // a second committed slice arrives incrementally
      IngestWriter.writeBatch(
        ds,
        Seq((t("2024-01-02T00:00:00Z"), "b", 2L)).toDF("event_time", "k", "v"),
        MergeStrategy.Append(), systemTime = 2000L)
      q.processAllAvailable()
      val got = spark.table("dstream_out").as[(String, Long)].collect().toSet
      assert(got === Set(("a", 10L), ("b", 20L)))
    } finally q.stop()
  }

  test("streaming transform: checkpoint artifact in the chain, kill-and-resume exactly-once") {
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.model.MetadataEvent
    import graft.operators.MergeStrategy

    val root = java.nio.file.Files.createTempDirectory("graft-stransform-")
    val src = Dataset.create(spark, root.resolve("src"), "src_t", systemTime = 0L)
    Dataset.create(spark, root.resolve("out"), "out_t", kind = "derivative", systemTime = 0L)
    IngestWriter.writeBatch(src,
      Seq((t("2024-01-01T00:00:00Z"), 1L)).toDF("event_time", "v"),
      MergeStrategy.Append(), systemTime = 1000L)

    def xform(df: org.apache.spark.sql.DataFrame) = df.selectExpr("event_time", "v * 10 AS v10")
    var batchTime = 0L
    val clock = () => { batchTime += 1000; batchTime }

    val q1 = StreamingTransform.start(
      Dataset.open(spark, root.resolve("out")),
      Dataset.open(spark, root.resolve("src")), xform, "resume-test", clock)
    try q1.processAllAvailable() finally q1.stop()

    val after1 = Dataset.open(spark, root.resolve("out"))
    assert(after1.toDF().select("v10").as[Long].collect().toSeq === Seq(10L))
    val et1 = after1.chain.lastExecuteTransform().get
    // checkpoint artifact recorded: name, content hash, nonzero size
    assert(et1.newCheckpoint.isDefined)
    assert(et1.newCheckpoint.get.name === "transform-resume-test")
    assert(et1.newCheckpoint.get.contentHash.length === 64)
    assert(et1.inputs === Seq(MetadataEvent.TransformInputState("src_t", None, Some(0L))))

    // a second input slice lands while the query is DOWN
    IngestWriter.writeBatch(src,
      Seq((t("2024-01-02T00:00:00Z"), 2L)).toDF("event_time", "v"),
      MergeStrategy.Append(), systemTime = 2000L)

    // resume with the same query name: only the new slice is processed
    val q2 = StreamingTransform.start(
      Dataset.open(spark, root.resolve("out")),
      Dataset.open(spark, root.resolve("src")), xform, "resume-test", clock)
    try q2.processAllAvailable() finally q2.stop()

    val after2 = Dataset.open(spark, root.resolve("out"))
    // each input row transformed exactly once across the restart
    assert(after2.toDF().orderBy("offset").select("v10").as[Long].collect().toSeq
      === Seq(10L, 20L))
    val ets = after2.chain.blocks().map(_.event).collect {
      case e: MetadataEvent.ExecuteTransform => e
    }
    assert(ets.size === 2)
    assert(ets(1).inputs.head.prevOffset === Some(0L))
    assert(ets(1).inputs.head.newOffset === Some(1L))

    // a replayed micro-batch (stale input interval) is skipped outright
    val staleInput = Dataset.open(spark, root.resolve("src")).toDF()
    assert(StreamingTransform.commitBatch(
      after2, "src_t", staleInput, xform(staleInput), 9999L).isEmpty)
    assert(Dataset.open(spark, root.resolve("out")).toDF().count() === 2)
  }

  test("changelog-input streaming transform: -C/+C/-R ops pass through, state stays correct") {
    // README retraction matrix, rows 'Batch SQL transforms' / 'Streaming
    // ingest': a transform that PROJECTS op propagates retractions and
    // corrections exactly (what the reference pins for its Spark engine in
    // test_engine_transform.rs:651-666 — Flink/RW cannot,
    // :673-676,719-735).
    import graft.dataset.Dataset
    import graft.ingest.IngestWriter
    import graft.operators.{Changelog, MergeStrategy}

    val root = java.nio.file.Files.createTempDirectory("graft-chlog-stream-")
    val src = Dataset.create(spark, root.resolve("src"), "src_cl", systemTime = 0L)
    Dataset.create(spark, root.resolve("out"), "out_cl", kind = "derivative", systemTime = 0L)
    // snapshot merge over three rounds -> +A, then -C/+C (update) and +A,
    // then -R (kyiv disappears): every op kind lands in the source chain
    val rounds = Seq(
      Seq(("kyiv", 2884000), ("seattle", 733000)),
      Seq(("kyiv", 2884000), ("seattle", 750000), ("odessa", 1015000)),
      Seq(("seattle", 750000), ("odessa", 1015000)))
    rounds.zipWithIndex.foreach { case (r, i) =>
      IngestWriter.writeBatch(src, r.toDF("city", "population"),
        MergeStrategy.Snapshot(Seq("city")), systemTime = 1000L * (i + 1))
    }
    val srcOps = src.toDF().orderBy("offset").select("op").as[Int].collect().toSeq
    assert(srcOps.toSet === Set(Op.Append, Op.Retract, Op.CorrectFrom, Op.CorrectTo))

    // map-only transform that CARRIES op: population scaled, ops untouched
    def xform(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("op", "event_time", "city", "population * 10 AS population")
    val q = StreamingTransform.start(
      Dataset.open(spark, root.resolve("out")),
      Dataset.open(spark, root.resolve("src")), xform, "chlog-test", () => 5000L)
    try q.processAllAvailable() finally q.stop()

    val out = Dataset.open(spark, root.resolve("out")).toDF()
    // ops preserved 1:1 in offset order
    assert(out.orderBy("offset").select("op").as[Int].collect().toSeq === srcOps)
    // and the changelog still projects to the correct final state
    val state = Changelog.project(out, Seq("city"))
      .select("city", "population").as[(String, Int)].collect().toSet
    assert(state === Set(("seattle", 7500000), ("odessa", 10150000)))
  }

  test("streaming window aggs are append-only: a retraction row is data, not a reversal") {
    // README retraction matrix, row 'Streaming window aggs': pins the
    // documented limitation (shared with the reference's streaming engines,
    // test_engine_transform.rs:719-735) — route changelog streams through
    // the batch incremental path instead.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Int, String, Double)]
    val df = mem.toDF().toDF("ts", "op", "k", "v")
    val agg = StreamingOps.tumblingWindowAgg(df, timeCol = "ts",
      windowDuration = "1 hour", watermarkDelay = "0 seconds",
      keys = Seq(col("k")), aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total")))
    val q = agg.writeStream.format("memory").queryName("retr_limit")
      .outputMode("append").start()
    try {
      mem.addData(
        (t("2024-01-01T00:10:00Z"), Op.Append, "a", 10.0),
        (t("2024-01-01T00:20:00Z"), Op.Retract, "a", 10.0), // NOT reversed
        (t("2024-01-01T03:00:00Z"), Op.Append, "a", 1.0))   // advances watermark
      q.processAllAvailable()
      val row = spark.table("retr_limit")
        .select("n", "total").as[(Long, Double)].collect()
      // both rows counted: the -R row contributed like an append
      assert(row.toSeq === Seq((2L, 20.0)))
    } finally q.stop()
  }

  test("changelogStateStream: flatMapGroupsWithState folds -R/-C/+C into per-key state") {
    // README retraction matrix: TRUE streaming consumption of retractions —
    // per-key GroupState fold, emitting upserts and tombstones; final state
    // equals the batch Changelog.project of the same ledger.
    import graft.operators.Changelog
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Int, String, Int)]
    val df = mem.toDF().toDF("offset", "op", "city", "population")
    val q = StreamingOps.changelogStateStream(df, Seq("city"))
      .writeStream.format("memory").queryName("chlog_state").outputMode("update").start()
    try {
      // batch 1: two appends
      mem.addData((0L, Op.Append, "kyiv", 2884000), (1L, Op.Append, "seattle", 733000))
      q.processAllAvailable()
      val b1 = spark.table("chlog_state")
        .select("city", "population", "op").as[(String, Int, Int)].collect().toSet
      assert(b1 === Set(("kyiv", 2884000, Op.Append), ("seattle", 733000, Op.Append)))

      // batch 2: correction pair for seattle + retraction of kyiv — the
      // -C/+C pair lands as one upsert, the -R as a tombstone
      mem.addData(
        (2L, Op.CorrectFrom, "seattle", 733000),
        (3L, Op.CorrectTo, "seattle", 750000),
        (4L, Op.Retract, "kyiv", 2884000))
      q.processAllAvailable()
      val b2 = spark.table("chlog_state")
        .select("offset", "city", "population", "op").as[(Long, String, Int, Int)].collect()
        .filter(_._1 >= 2L).toSet
      assert(b2 === Set((3L, "seattle", 750000, Op.CorrectTo), (4L, "kyiv", 2884000, Op.Retract)))

      // batch 3: kyiv re-appears after its retraction (state was removed)
      mem.addData((5L, Op.Append, "kyiv", 2900000))
      q.processAllAvailable()

      // final state from the delta stream (last emission per key, drop
      // tombstones) must equal the batch projection of the full ledger
      val deltas = spark.table("chlog_state")
        .select("offset", "op", "city", "population").as[(Long, Int, String, Int)].collect()
      val lastPerKey = deltas.groupBy(_._3).view.mapValues(_.maxBy(_._1)).values
        .filterNot(r => r._2 == Op.Retract || r._2 == Op.CorrectFrom)
        .map(r => (r._3, r._4)).toSet
      val ledger = Seq(
        (0L, Op.Append, "kyiv", 2884000), (1L, Op.Append, "seattle", 733000),
        (2L, Op.CorrectFrom, "seattle", 733000), (3L, Op.CorrectTo, "seattle", 750000),
        (4L, Op.Retract, "kyiv", 2884000), (5L, Op.Append, "kyiv", 2900000)
      ).toDF("offset", "op", "city", "population")
      val batch = Changelog.project(ledger, Seq("city"))
        .select("city", "population").as[(String, Int)].collect().toSet
      assert(lastPerKey === batch)
      assert(lastPerKey === Set(("seattle", 750000), ("kyiv", 2900000)))
    } finally q.stop()
  }

  test("streaming ingest commits micro-batches to the chain; replayed batch is skipped") {
    import graft.dataset.Dataset
    import graft.operators.MergeStrategy
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-sing-")
    val ds = Dataset.create(spark, root.resolve("ds"), "stream_ds", systemTime = 0L)
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("event_time", "tag")
    var batchTime = 0L
    val q = StreamingIngest.start(
      ds, df, MergeStrategy.Append(),
      clock = () => { batchTime += 1000; batchTime })
    try {
      mem.addData((t("2024-01-01T00:00:00Z"), "a"), (t("2024-01-01T01:00:00Z"), "b"))
      q.processAllAvailable()
      mem.addData((t("2024-01-02T00:00:00Z"), "c"))
      q.processAllAvailable()
    } finally q.stop()

    val reopened = Dataset.open(spark, root.resolve("ds"))
    val rows = reopened.toDF().orderBy("offset").collect()
    assert(rows.map(_.getAs[String]("tag")).toSeq === Seq("a", "b", "c"))
    assert(reopened.chain.slices().size === 2)
    assert(StreamingIngest.lastCommittedBatch(reopened) === Some(1L))

    // crash-replay of an already-committed batch id -> skipped, chain unchanged
    val replay = Seq((t("2024-01-02T00:00:00Z"), "c")).toDF("event_time", "tag")
    assert(StreamingIngest.commitBatch(reopened, replay, MergeStrategy.Append(), 1L, 99L).isEmpty)
    assert(Dataset.open(spark, root.resolve("ds")).toDF().count() === 3)
    // a genuinely new batch id commits
    val fresh = Seq((t("2024-01-03T00:00:00Z"), "d")).toDF("event_time", "tag")
    assert(StreamingIngest.commitBatch(reopened, fresh, MergeStrategy.Append(), 2L, 100000L).isDefined)
    assert(Dataset.open(spark, root.resolve("ds")).toDF().count() === 4)
  }

  test("anomalyStream: verdicts match the batch sweep bit-for-bit across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = StreamingOps.anomalyStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", lookback = 20, minN = 8, threshold = 2.0)
    val q = out.writeStream.format("memory").queryName("anom_spec")
      .outputMode("append").start()
    def ev(i: Int, v: Double) =
      (1L, t(f"2024-01-01T10:${i}%02d:00Z"), 100L + i, v)
    // 10 stable values split across two batches (the ring buffer must carry),
    // then a spike in a third batch
    val all = (0 until 10).map(i => ev(i, 10.0 + (i % 3) * 0.5)) :+ ev(10, 100.0)
    try {
      mem.addData(all.take(4)); q.processAllAvailable()
      mem.addData(all.slice(4, 10)); q.processAllAvailable()
      mem.addData(Seq(all.last)); q.processAllAvailable()
      val got = spark.table("anom_spec")
        .as[(Long, Timestamp, Long, Double, Long)].collect().toSet
      val batch = graft.operators.Analytics.anomalies(
        all.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", 20, 8, 2.0)
        .as[(Long, Timestamp, Long, Double, Long)].collect().toSet
      assert(got === batch)
      assert(got.size === 1 && got.head._3 === 110L && got.head._5 > 2000000L)
    } finally q.stop()
  }

  test("funnelStream: cross-batch step machine, in-batch sort, strict ordering, single emission") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long)]
    val out = StreamingOps.funnelStream(
      mem.toDF().toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", "event_id", steps = Seq("view", "click", "purchase"))
    val q = out.writeStream.format("memory").queryName("funnel_spec")
      .outputMode("append").start()
    try {
      // batch 1 (out of order WITHIN the batch — must sort): u1 views at
      // 10:00; the 10:00 click must NOT advance (strict >), the 10:05 does
      mem.addData(
        (1L, "click", t("2024-01-01T10:05:00Z"), 12L),
        (1L, "view", t("2024-01-01T10:00:00Z"), 10L),
        (1L, "click", t("2024-01-01T10:00:00Z"), 11L),
        (2L, "purchase", t("2024-01-01T10:00:00Z"), 20L)) // purchase before any view: no progress
      q.processAllAvailable()
      assert(spark.table("funnel_spec").count() === 0L)
      // batch 2: u1 completes ACROSS the boundary; u2 only now views
      mem.addData(
        (1L, "purchase", t("2024-01-01T11:00:00Z"), 13L),
        (2L, "view", t("2024-01-01T11:00:00Z"), 21L))
      q.processAllAvailable()
      val got = spark.table("funnel_spec")
        .as[(Long, Timestamp, Timestamp, Timestamp)].collect()
      assert(got.toSeq === Seq((1L,
        t("2024-01-01T10:00:00Z"), t("2024-01-01T10:05:00Z"), t("2024-01-01T11:00:00Z"))))
      // batch 3: a second full chain for u1 does NOT re-emit (terminal state)
      mem.addData(
        (1L, "view", t("2024-01-01T12:00:00Z"), 14L),
        (1L, "click", t("2024-01-01T12:01:00Z"), 15L),
        (1L, "purchase", t("2024-01-01T12:02:00Z"), 16L))
      q.processAllAvailable()
      assert(spark.table("funnel_spec").count() === 1L)
    } finally q.stop()
  }

  test("attributionStream: cross-batch touch carry, in-batch sort, re-arm after conversion") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long)]
    val out = StreamingOps.attributionStream(
      mem.toDF().toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "ts", "event_id", "event_type",
      conversionType = "purchase", touchTypes = Seq("view", "click"))
    val q = out.writeStream.format("memory").queryName("attr_spec")
      .outputMode("append").start()
    try {
      // batch 1 (out of order WITHIN the batch — must sort): the purchase
      // at 10:02 attributes to the 10:01 click, not the 10:00 view; u2's
      // conversion has no prior touch and emits nothing
      mem.addData(
        (1L, "purchase", t("2024-01-01T10:02:00Z"), 12L),
        (1L, "view", t("2024-01-01T10:00:00Z"), 10L),
        (1L, "click", t("2024-01-01T10:01:00Z"), 11L),
        (2L, "purchase", t("2024-01-01T10:00:00Z"), 20L))
      q.processAllAvailable()
      def rows() = spark.table("attr_spec")
        .as[(Long, Timestamp, Long, String, Timestamp, Long)].collect().toSeq.sortBy(_._3)
      assert(rows() === Seq(
        (1L, t("2024-01-01T10:02:00Z"), 12L, "click", t("2024-01-01T10:01:00Z"), 60000000L)))
      // batch 2: the touch state CARRIES across the boundary — a second
      // conversion with no new touch re-attributes to the same click
      // (batch semantics: state never clears), then a later view re-arms
      mem.addData((1L, "purchase", t("2024-01-01T11:00:00Z"), 13L))
      q.processAllAvailable()
      assert(rows().map(r => (r._3, r._4, r._5)) === Seq(
        (12L, "click", t("2024-01-01T10:01:00Z")),
        (13L, "click", t("2024-01-01T10:01:00Z"))))
      mem.addData(
        (1L, "view", t("2024-01-01T12:00:00Z"), 14L),
        (1L, "purchase", t("2024-01-01T12:05:00Z"), 15L))
      q.processAllAvailable()
      assert(rows().last === (1L, t("2024-01-01T12:05:00Z"), 15L, "view",
        t("2024-01-01T12:00:00Z"), 300000000L))
    } finally q.stop()
  }

  test("sessionizeStream: cross-batch sessions, timeout finalization, numbering survives expiry") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = StreamingOps.sessionizeStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_spec")
      .outputMode("append").start()
    try {
      // batch 1: u1 opens a session (out-of-order WITHIN the batch — must sort)
      mem.addData(
        (1L, t("2024-01-01T10:10:00Z"), 11L, 2.0),
        (1L, t("2024-01-01T10:00:00Z"), 10L, 1.0))
      q.processAllAvailable()
      // batch 2: u1's session CONTINUES across the batch boundary (gap 20m),
      // u2 opens one
      mem.addData(
        (1L, t("2024-01-01T10:30:00Z"), 12L, 4.0),
        (2L, t("2024-01-01T10:30:00Z"), 20L, 7.5))
      q.processAllAvailable()
      // batch 3: far-future row advances the watermark; batch 4 fires timeouts
      mem.addData((9L, t("2024-02-01T00:00:00Z"), 90L, 0.0))
      q.processAllAvailable()
      mem.addData((9L, t("2024-03-01T00:00:00Z"), 91L, 0.0))
      q.processAllAvailable()
      // batch 5: u1 returns AFTER its state expired to a zombie counter
      // (strictly later than the watermark, or the row is dropped as late):
      // numbering must continue at 2, not restart at 1
      mem.addData((1L, t("2024-03-15T00:00:00Z"), 13L, 8.0))
      q.processAllAvailable()
      mem.addData((9L, t("2024-04-01T00:00:00Z"), 92L, 0.0))
      q.processAllAvailable()
      mem.addData((9L, t("2024-05-01T00:00:00Z"), 93L, 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_spec").filter(col("user_id") < 9L)
        .as[(Long, Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(got === Set(
        (1L, 1L, t("2024-01-01T10:00:00Z"), t("2024-01-01T10:30:00Z"), 3L, 7.0),
        (2L, 1L, t("2024-01-01T10:30:00Z"), t("2024-01-01T10:30:00Z"), 1L, 7.5),
        (1L, 2L, t("2024-03-15T00:00:00Z"), t("2024-03-15T00:00:00Z"), 1L, 8.0)))
      // and the whole thing equals the batch operator on the same rows
      val batch = graft.operators.Analytics.sessionize(
        Seq(
          (1L, t("2024-01-01T10:00:00Z"), 10L, 1.0),
          (1L, t("2024-01-01T10:10:00Z"), 11L, 2.0),
          (1L, t("2024-01-01T10:30:00Z"), 12L, 4.0),
          (2L, t("2024-01-01T10:30:00Z"), 20L, 7.5),
          (1L, t("2024-03-15T00:00:00Z"), 13L, 8.0)
        ).toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", gapMinutes = 30)
        .as[(Long, Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("scd2Stream: closes on successor/retract, skips -C, flushes current via timeout") {
    implicit val sqlCtx = spark.sqlContext
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val mem = MemoryStream[(Long, Double, Long, Int, Timestamp)]
    val out = StreamingOps.scd2Stream(
      mem.toDF().toDF("k", "bal", "offset", "op", "event_time"),
      "k", "bal", "offset", "op", "event_time", horizonMinutes = 10L * 24 * 60)
    val q = out.writeStream.format("memory").queryName("scd2_spec")
      .outputMode("append").start()
    try {
      // key 1: A@01, -C/+C@03, -R@05; key 2: A@01 only (stays current)
      mem.addData(Seq((1L, 10.0, 10L, 0, ts("2024-01-01")),
        (2L, 5.0, 20L, 0, ts("2024-01-01"))))
      q.processAllAvailable()
      mem.addData(Seq((1L, 10.0, 11L, 2, ts("2024-01-03")),
        (1L, 20.0, 12L, 3, ts("2024-01-03"))))
      q.processAllAvailable()
      mem.addData(Seq((1L, 0.0, 13L, 1, ts("2024-01-05"))))
      q.processAllAvailable()
      Seq("2024-02-01", "2024-03-01").zipWithIndex.foreach { case (d, i) =>
        mem.addData(Seq((-1L - i, 0.0, -1L - i, 0, ts(d))))
        q.processAllAvailable()
      }
      val got = spark.table("scd2_spec").filter(col("k") >= 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getLong(4))).toSet
      assert(got === Set(
        (1L, 10.0, ts("2024-01-01"), Some(ts("2024-01-03")), 0L),
        (1L, 20.0, ts("2024-01-03"), Some(ts("2024-01-05")), 0L),
        (2L, 5.0, ts("2024-01-01"), None, 1L)))
    } finally q.stop()
  }

  test("applyRollupBatch: batches merge exactly; replayed and stale batch ids are no-ops") {
    val table = "streaming_spec_rollup"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val apply = StreamingOps.applyRollupBatch(table, Seq("k"), Seq("v")) _
    def state() = StreamingOps.readStreamRollup(spark, table, Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    apply(Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v"), 0L)
    assert(state() === Map("a" -> ((2L, 3.0)), "b" -> ((1L, 10.0))))
    apply(Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v"), 1L)
    val merged = Map("a" -> ((3L, 7.0)), "b" -> ((1L, 10.0)), "c" -> ((1L, 7.0)))
    assert(state() === merged)
    // failure-recovery replay of the LAST epoch and of an OLD epoch: no-ops
    apply(Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v"), 1L)
    assert(state() === merged)
    apply(Seq(("a", 999.0)).toDF("k", "v"), 0L)
    assert(state() === merged)
  }

  test("applyUpsertBatch: ledger advances per epoch, replay no-ops, projection = state") {
    val table = "streaming_spec_upsert"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val apply = StreamingOps.applyUpsertBatch(table, Seq("k"), "arr") _
    def state() = graft.operators.Changelog
      .project(spark.table(table).drop("__batch"), Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    // epoch 0: first batch — retraction of nothing dropped, rest appends
    apply(Seq((1L, 10.0, 0, 1L), (2L, 5.0, 0, 2L), (9L, 0.0, 1, 3L))
      .toDF("k", "v", "op", "arr"), 0L)
    assert(state() === Map(1L -> 10.0, 2L -> 5.0))
    // epoch 1: update k=1 (correction pair), retract k=2, new k=3; the
    // in-batch dedupe keeps the LAST row per key by arrival order
    apply(Seq((1L, 11.0, 0, 4L), (1L, 12.0, 0, 5L), (2L, 0.0, 1, 6L), (3L, 7.0, 0, 7L))
      .toDF("k", "v", "op", "arr"), 1L)
    val after = Map(1L -> 12.0, 3L -> 7.0)
    assert(state() === after)
    val rows = spark.table(table).count()
    // replayed epoch 1 (crash-after-commit regime): guard no-ops, ledger unchanged
    apply(Seq((1L, 12.0, 0, 5L)).toDF("k", "v", "op", "arr"), 1L)
    assert(spark.table(table).count() === rows && state() === after)
    // offsets are contiguous and unique across epochs
    val offs = spark.table(table).select(col("offset")).collect().map(_.getLong(0)).sorted
    assert(offs.toSeq === (0L until rows).toSeq)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("applyRollupBatch: crash between DROP and RENAME recovers history on replay") {
    val table = "streaming_spec_rollup_crash"
    val tmp = s"${table}_stream_tmp"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    val apply = StreamingOps.applyRollupBatch(table, Seq("k"), Seq("v")) _
    def state() = StreamingOps.readStreamRollup(spark, table, Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    apply(Seq(("a", 1.0), ("b", 10.0)).toDF("k", "v"), 0L)
    apply(Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v"), 1L)
    val merged = Map("a" -> ((2L, 5.0)), "b" -> ((1L, 10.0)), "c" -> ((1L, 7.0)))
    assert(state() === merged)
    // Emulate the torn swap of a FAILED batch-2 epoch: the merged result
    // (batch 2 included) is fully staged in tmp, the main table already
    // dropped, crash before RENAME. Streaming then REPLAYS batch 2.
    graft.operators.Bucketing.materializePlain(
      spark.table(table).drop("__batch")
        .unionByName(Seq(("d", 2.0)).toDF("k", "v")
          .groupBy("k").agg(count(lit(1)).as("n_rows"),
            sum(col("v").cast("decimal(18,6)")).cast("decimal(38,6)").as("sum_v")))
        .groupBy("k").agg(sum(col("n_rows")).as("n_rows"),
          sum(col("sum_v")).cast("decimal(38,6)").as("sum_v"))
        .withColumn("__batch", lit(2L)).localCheckpoint(), tmp)
    spark.sql(s"DROP TABLE `$table`")
    assert(!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp))
    val withD = merged + ("d" -> ((1L, 2.0)))
    // replayed epoch 2: recovery completes the interrupted swap FIRST, so
    // the guard sees stored=2 and the replay is a no-op — history intact,
    // NOT silently reinitialized from the replayed micro-batch alone.
    apply(Seq(("d", 2.0)).toDF("k", "v"), 2L)
    assert(state() === withD)
    assert(!spark.catalog.tableExists(tmp))
    // and the stream keeps advancing normally afterwards
    apply(Seq(("a", 1.0)).toDF("k", "v"), 3L)
    assert(state() === (withD + ("a" -> ((3L, 6.0)))))
  }

  test("applyRollupBatch: an empty first micro-batch leaves a usable (not crashing) table") {
    val table = "streaming_spec_rollup_empty"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `${table}_stream_tmp`")
    val apply = StreamingOps.applyRollupBatch(table, Seq("k"), Seq("v")) _
    apply(Seq.empty[(String, Double)].toDF("k", "v"), 0L) // zero-row table created
    assert(spark.table(table).count() === 0L)
    // the next tick must treat the empty table like a missing one, not throw
    apply(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), 1L)
    val got = StreamingOps.readStreamRollup(spark, table, Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0))))
  }
  test("applyJoinViewBatch: partial-commit crash replays deterministically") {
    import spark.implicits._
    try {
      val tick = StreamingOps.applyJoinViewBatch(
        "spec_jv_v", "spec_jv_a", "spec_jv_b",
        Seq("k"), Seq("av"), Seq("bv")) _
      def mk(rows: Seq[(Long, Option[Long], Option[String], String)]) =
        rows.toDF("k", "av", "bv", "__side")
      // epoch 0: a:(1,10),(2,20); b:(1,"x")
      tick(mk(Seq((1L, Some(10L), None, "a"), (2L, Some(20L), None, "a"),
        (1L, None, Some("x"), "b"))), 0L)
      assert(spark.table("spec_jv_v").count() === 1L) // (1,10,x)
      // epoch 1 delta: a:(1,11); b:(2,"y") -> view grows by (1,11,x),(2,20,y)
      val e1 = mk(Seq((1L, Some(11L), None, "a"), (2L, None, Some("y"), "b")))
      tick(e1, 1L)
      val after1 = spark.table("spec_jv_v").count()
      assert(after1 === 3L)
      // CRASH SIMULATION for epoch 2: view committed, sources NOT.
      // Run the real tick, then wind the source tables back to < 2.
      val e2 = mk(Seq((3L, Some(30L), None, "a"), (3L, None, Some("z"), "b")))
      tick(e2, 2L)
      val vRows = spark.table("spec_jv_v").count()
      for (t <- Seq("spec_jv_a", "spec_jv_b")) {
        val kept = spark.table(t).filter(col("__batch") < 2L).localCheckpoint()
        graft.operators.Bucketing.materializePlain(kept, t)
      }
      // replay epoch 2: view guard no-ops, both source appends complete
      tick(e2, 2L)
      assert(spark.table("spec_jv_v").count() === vRows) // not double-applied
      assert(spark.table("spec_jv_a").filter(col("__batch") === 2L).count() === 1L)
      assert(spark.table("spec_jv_b").filter(col("__batch") === 2L).count() === 1L)
      // full replay of epoch 2 again: all three no-op
      tick(e2, 2L)
      assert(spark.table("spec_jv_v").count() === vRows)
      assert(spark.table("spec_jv_a").count() === 4L) // 2 + 1 + 1 per epoch
      assert(spark.table("spec_jv_b").count() === 3L)
      // final view == from-scratch join of final sources
      val a = spark.table("spec_jv_a").drop("__batch")
      val b = spark.table("spec_jv_b").drop("__batch")
      val expect = a.join(b, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val got = spark.table("spec_jv_v").drop("__batch").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(got === expect)
    } finally Seq("spec_jv_v", "spec_jv_a", "spec_jv_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
